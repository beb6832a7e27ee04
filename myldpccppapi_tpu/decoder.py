"""High-level decoder facade.

The TPU-native counterpart of the reference's ``Coder::forDecoder`` +
``addDecodeType`` + ``decode`` arming/streaming split (``MyLdpc.cpp:167-618``):
construction does all precompute and jit-compilation wiring once; calls then
decode arbitrary batches.  Algorithm variants are configuration, not separate
buffer/kernel plumbing.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .codes.qc import QCCode
from .ops.bp import DecodeResult, decode_qc
from .utils.config import DecoderConfig

__all__ = ["Decoder", "DecodeResult"]


def _implementation(cfg: DecoderConfig) -> str:
    if cfg.implementation != "auto":
        return cfg.implementation
    # Pallas fused kernels are used on TPU when the code fits VMEM; the jnp
    # path is the portable fallback (CPU tests, interpreters).
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    if platform == "tpu":
        from .ops import pallas_bp

        return "pallas" if pallas_bp.supported(None) else "jnp"
    return "jnp"


class Decoder:
    """Batched LDPC decoder bound to one code + one configuration.

    >>> dec = Decoder(wimax(576, "3/4B"), DecoderConfig(schedule="layered"))
    >>> result = dec(llr)          # llr: [B, n] float, positive => bit 0
    >>> info = dec.info_bits(result)
    """

    def __init__(self, code: QCCode, config: DecoderConfig | None = None, **overrides):
        if config is None:
            config = DecoderConfig()
        if overrides:
            import dataclasses

            config = dataclasses.replace(config, **overrides)
        self.code = code
        self.config = config
        impl = _implementation(config)
        if impl == "pallas":
            from .ops import pallas_bp

            if pallas_bp.supported(code):
                self._fn = jax.jit(partial(pallas_bp.decode_qc_pallas, code, config))
            else:
                impl = "jnp"
        if impl == "jnp":
            self._fn = jax.jit(partial(decode_qc, code, config))
        self.implementation = impl

    def __call__(self, llr: jax.Array) -> DecodeResult:
        if llr.ndim != 2 or llr.shape[-1] != self.code.n:
            raise ValueError(
                f"expected llr of shape [batch, {self.code.n}], got {llr.shape}"
            )
        return self._fn(llr.astype(jnp.float32))

    def info_bits(self, result: DecodeResult) -> jax.Array:
        """Systematic information bits of the decoded codewords: [B, k]."""
        return result.bits[:, : self.code.k]

    def lower(self, batch_size: int):
        """Lower/compile for a fixed batch size (for AOT benchmarking)."""
        shape = jax.ShapeDtypeStruct((batch_size, self.code.n), jnp.float32)
        return self._fn.lower(shape)
