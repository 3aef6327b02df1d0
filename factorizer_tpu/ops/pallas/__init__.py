from .nmf_kernel import nmf_reconstruct, xla_nmf_reconstruct, supports
from .windowed_nmf_kernel import (
    windowed_nmf_reconstruct,
    xla_windowed_nmf_reconstruct,
    supports_windowed,
)
