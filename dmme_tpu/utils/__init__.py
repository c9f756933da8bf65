from dmme_tpu.utils.noise import gaussian, gaussian_like, uniform_int, pad
from dmme_tpu.utils.norm import norm, denorm
from dmme_tpu.utils.vis import make_history, make_grid

__all__ = [
    "gaussian",
    "gaussian_like",
    "uniform_int",
    "pad",
    "norm",
    "denorm",
    "make_history",
    "make_grid",
]
