from .encoder import Encoder
from .decoder import Decoder
from .regularizers import DiagonalGaussianRegularizer, FSQRegularizer, FSQ, DiagonalGaussian

__all__ = [
    "Encoder",
    "Decoder",
    "DiagonalGaussianRegularizer",
    "FSQRegularizer",
    "FSQ",
    "DiagonalGaussian",
]
