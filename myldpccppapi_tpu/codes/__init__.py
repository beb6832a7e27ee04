"""Code construction: base matrices, QC lifting, GF(2) algebra, encoders."""
from .qc import QCCode
from .encoder import Encoder, EncoderMatrices, encode_numpy, ru_precompute
from .wimax import wimax
from .wifi import wifi

__all__ = [
    "QCCode",
    "Encoder",
    "EncoderMatrices",
    "encode_numpy",
    "ru_precompute",
    "wimax",
    "wifi",
]
