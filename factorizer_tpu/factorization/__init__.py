from .solvers import (
    BCDSolver,
    LeastSquares,
    ProjectedGradient,
    CoordinateDescent,
    MultiplicativeUpdate,
    FastMultiplicativeUpdate,
    WeightedMultiplicativeUpdate,
    SemiMultiplicativeUpdate,
    Compose,
    SOLVER_DISPATCH_MAP,
    parse_solver,
)
from .inits import RandomInit, SVDInit, NNDSVDInit, INIT_DISPATCH_MAP, parse_init
from .svd import SVD, infer_rank, randomized_svd
from .nmf import MatrixFactorization, NMF
from .deconv import Deconv, batched_conv, sconv
from .kmeans import KMeans, FuzzyCMeans, EntropyKMeans
