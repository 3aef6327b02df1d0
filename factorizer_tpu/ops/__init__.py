from .math import dot, norm2, softmax, relative_error, kl_divergence
from .reshape import Reshape, Matricize, SWMatricize
