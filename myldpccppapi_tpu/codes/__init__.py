"""Code construction: base matrices, QC lifting, GF(2) algebra, encoders."""
from .qc import QCCode
from .encoder import (
    Encoder,
    EncoderMatrices,
    encode_numpy,
    generic_precompute,
    ru_precompute,
)
from .wimax import wimax
from .wifi import wifi
from .regular import regular
from .nr import nr_code
from .nr_transport import (
    NRTransport,
    TBFormat,
    TBResult,
    plan_tb,
    select_base_graph,
)
from .dvbs2 import dvbs2, dvbs2_ira_qc, dvbs2_oracle, ira_encode_fn
from .pexit import pexit_run, protograph, threshold_ebn0, threshold_sigma
from .rs_ldpc import RSLDPCCode, rs_ldpc
from .crc import crc_attach_fn, crc_check_fn, crc_matrix, crc_numpy
from .bch import (
    bch_attach_fn,
    bch_check_fn,
    bch_correct,
    bch_params_dvbs2,
)

__all__ = [
    "bch_attach_fn",
    "bch_check_fn",
    "bch_correct",
    "bch_params_dvbs2",
    "crc_attach_fn",
    "crc_check_fn",
    "crc_matrix",
    "crc_numpy",
    "dvbs2",
    "dvbs2_ira_qc",
    "dvbs2_oracle",
    "ira_encode_fn",
    "nr_code",
    "NRTransport",
    "pexit_run",
    "protograph",
    "threshold_ebn0",
    "threshold_sigma",
    "plan_tb",
    "select_base_graph",
    "TBFormat",
    "TBResult",
    "QCCode",
    "Encoder",
    "EncoderMatrices",
    "encode_numpy",
    "generic_precompute",
    "ru_precompute",
    "regular",
    "rs_ldpc",
    "RSLDPCCode",
    "wimax",
    "wifi",
]
