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

import numpy as np

from .codes.qc import QCCode
from .ops.bp import DecodeResult, decode_qc
from .utils.config import DecoderConfig

__all__ = ["Decoder", "DecodeResult"]


def _implementation(cfg: DecoderConfig, code) -> str:
    if cfg.implementation != "auto":
        return cfg.implementation
    if not hasattr(code, "blocks"):
        # no block structure (DVB-S2 oracle, random H): generic edge lists
        return "edgelist"
    if getattr(code, "group", "cyclic") == "xor":
        # RS-LDPC additive blocks: block-structured jnp path, or the fused
        # kernel's butterfly alignment on TPU (z-lane/stream are circulant-
        # only); the fused kernel serves soft output too (latched posterior)
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            platform = "cpu"
        if platform == "tpu":
            from .ops import pallas_bp
            from .ops.bp import weights_mode

            if (weights_mode(cfg, code.m_b) != "iter"
                    and (cfg.triage_iters == 0 or not cfg.soft_output)
                    and pallas_bp.supported(code, soft=cfg.soft_output)):
                # per-iteration (learned) schedules live on the jnp path,
                # same as the cyclic branch below
                return "pallas"
        return "jnp"
    if cfg.soft_output:
        # posterior-LLR output: both fused kernels hold the posterior in
        # VMEM and latch it at convergence, so short codes (pallas) and
        # long codes (z-lane: NR Z>=64, DVB-S2) serve soft output AT
        # KERNEL RATE; jnp remains the portable fallback
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            platform = "cpu"
        if platform == "tpu":
            from .ops import pallas_bp, pallas_zlane
            from .ops.bp import weights_mode

            if (weights_mode(cfg, code.m_b) != "iter"
                    and cfg.triage_iters == 0):
                if pallas_bp.supported(code, soft=True):
                    return "pallas"
                if pallas_zlane.zlane_supported(code, cfg):
                    return "pallas_zlane"
        return "jnp"
    # Fused Pallas kernels on TPU when the code's working set fits VMEM;
    # the jnp/XLA path is the portable fallback (CPU tests, interpreters).
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    if platform == "tpu":
        from .ops import pallas_bp, pallas_stream, pallas_zlane
        from .ops.bp import weights_mode

        if weights_mode(cfg, code.m_b) == "iter":
            # per-iteration (learned) weight schedules: jnp path — the
            # fused kernels' in-kernel while_loop has no per-iteration
            # weight indexing (per-LAYER schedules bake into their static
            # layer unroll and stay on the kernels)
            return "jnp"
        # SCMS rides the fused flooding kernel at zero extra VMEM (the
        # message scratch stores sent Q instead of R — pallas_bp.py); the
        # z-lane/stream kernels are layered-only and config validation pins
        # SCMS to flooding, so their supported() checks below reject it.
        if pallas_bp.supported(code):
            return "pallas"
        # long codes (DVB-S2 n=64800, NR Z=384): z-on-lanes fused kernel
        if pallas_zlane.zlane_supported(code, cfg):
            return "pallas_zlane"
        # beyond even the z-lane kernel's raisable VMEM ceiling: the
        # HBM-streaming kernel (measured 36x the XLA path on a plain-QC
        # n=153600 code — results.jsonl "stream_giant")
        if pallas_stream.stream_supported(code, cfg):
            return "pallas_stream"
        return "jnp"
    return "jnp"


class Decoder:
    """Batched LDPC decoder bound to one code + one configuration.

    Accepts a :class:`QCCode` (fast circulant-roll paths: jnp/XLA or fused
    Pallas kernel) or any object exposing ``n``/``m``/``h_coo()`` (generic
    edge-list path — DVB-S2, random constructions).

    >>> dec = Decoder(wimax(576, "3/4B"), DecoderConfig(schedule="layered"))
    >>> result = dec(llr)          # llr: [B, n] float, positive => bit 0
    >>> info = dec.info_bits(result)
    """

    def __init__(self, code, config: DecoderConfig | None = None, **overrides):
        if config is None:
            config = DecoderConfig()
        if overrides:
            import dataclasses

            config = dataclasses.replace(config, **overrides)
        from .ops.bitflip import GDBFConfig

        if isinstance(config, GDBFConfig):
            # bit-flipping tier: message-free noisy GDBF (ops/bitflip.py) —
            # ~4 vector ops/edge at a ~1.5 dB SNR cost vs BP; the decoder
            # class extreme-rate links deploy.  Deterministic under jit
            # (fixed perturbation key); call ops.bitflip.decode_gdbf
            # directly to supply fresh keys per batch.
            from .ops.bitflip import decode_gdbf

            if not hasattr(code, "blocks"):
                raise ValueError(
                    "GDBF runs on block-structured (QC / XOR-group) codes; "
                    "use a BP DecoderConfig for edge-list codes"
                )
            self.code = code
            self.config = config
            self.implementation = "gdbf"
            self._edge_idx = None
            self._fn = jax.jit(partial(decode_gdbf, code, config))
            return
        self.code = code
        self.config = config
        impl = _implementation(config, code)
        if config.soft_output and impl == "pallas_stream":
            raise ValueError(
                "soft_output is served by the jnp/edge-list paths and the "
                "fused pallas (short codes) / z-lane (long codes) kernels; "
                'the streaming kernel does not latch posteriors — use '
                'implementation="auto", "jnp", "pallas", or "pallas_zlane"'
            )
        if config.soft_output and config.triage_iters > 0:
            raise ValueError(
                "soft_output + triage is not supported: the two-phase "
                "wrapper merges hard outputs only"
            )
        if config.self_correction and impl in (
            "pallas_zlane", "pallas_stream", "edgelist"
        ):
            raise ValueError(
                "self_correction (SCMS) is served by the jnp QC path and "
                "the fused flooding kernel (short codes) "
                f"(requested implementation={impl!r}); use "
                'implementation="auto", "jnp", or "pallas"'
            )
        if impl == "pallas":
            from .ops import pallas_bp

            if not pallas_bp.supported(code, soft=config.soft_output):
                # auto never resolves here unsupported; an EXPLICIT request
                # gets the same loud refusal as the other kernels instead
                # of a silent jnp fallback mislabeled as the fused kernel
                # (soft=: the posterior output block counts against the
                # VMEM budget — refuse at construction, not first decode)
                raise ValueError(
                    "pallas (VMEM-resident short-code kernel) does not "
                    "support this code"
                    + (" with soft_output" if config.soft_output else "")
                    + ": needs an unmasked QCCode small enough for "
                    "128-lane VMEM tiles; use implementation=\"auto\" "
                    "for dispatch"
                )
        elif impl == "pallas_zlane":
            from .ops import pallas_zlane

            if not pallas_zlane.zlane_supported(code, config):
                raise ValueError(
                    "pallas_zlane needs a layered-schedule QCCode with "
                    "z >= 64 whose per-tile state fits VMEM"
                )
        elif impl == "pallas_stream":
            from .ops import pallas_stream

            if not pallas_stream.stream_supported(code, config):
                raise ValueError(
                    "pallas_stream supports layered min-sum f32 on plain "
                    "single-circulant QC codes only"
                )
        self.implementation = impl
        self._edge_idx = None
        self._fn = self._build_fn(config)
        if config.triage_iters > 0:
            self._fn = self._make_triage()
        if (config.crc or config.outer) and impl in (
            "pallas", "pallas_zlane", "pallas_stream"
        ):
            # fused kernels early-exit on the syndrome alone; CRC/outer-
            # aided acceptance wraps them (ops/crc_accept.py) — semantically
            # identical to an in-kernel latch because the bit-exact jnp
            # re-decode replays the kernel's trajectory and continues
            self._fn = self._make_crc_accept()

    def _build_fn(self, cfg: DecoderConfig):
        """The base decode callable for the resolved implementation under
        ``cfg`` (used at construction AND by the triage wrapper to build
        its short-budget fast pass)."""
        impl = self.implementation
        if impl == "pallas":
            from .ops import pallas_bp

            return partial(pallas_bp.decode_qc_pallas, self.code, cfg)
        if impl == "pallas_zlane":
            from .ops import pallas_zlane

            return partial(pallas_zlane.decode_qc_zlane, self.code, cfg)
        if impl == "pallas_stream":
            from .ops import pallas_stream

            return partial(pallas_stream.decode_qc_stream, self.code, cfg)
        if impl == "edgelist":
            from .ops.bp_edgelist import build_edge_index, decode_edgelist

            if self._edge_idx is None:
                idx = getattr(self.code, "edge_index", None)
                if idx is None:
                    rows, cols = self.code.h_coo()
                    layer = (
                        np.arange(self.code.m, dtype=np.int32) // self.code.z
                        if hasattr(self.code, "z")
                        else None
                    )
                    idx = build_edge_index(rows, cols, self.code.n,
                                           self.code.m, layer)
                self._edge_idx = idx
            from .ops.bp import accept_fail_fn

            crc_fail = accept_fail_fn(self.code, cfg)
            return jax.jit(
                partial(decode_edgelist, self._edge_idx, cfg,
                        crc_fail=crc_fail)
            )
        # jnp: decode_qc handles cfg.crc natively (CRC folded into the
        # early-exit latch)
        return jax.jit(partial(decode_qc, self.code, cfg))

    def _make_triage(self):
        """Wrap the decoder in the two-phase straggler triage
        (ops/triage.py): fast short pass, then full-budget re-decode of the
        compacted unaccepted frames.  Bit-identical to single-pass; applies
        to every implementation (the wrapper only needs opaque callables)."""
        import dataclasses

        cfg = self.config
        from .ops.triage import decode_two_phase

        fast = self._build_fn(dataclasses.replace(
            cfg, max_iters=cfg.triage_iters, triage_iters=0))
        full = self._build_fn(dataclasses.replace(cfg, triage_iters=0))

        @jax.jit
        def fn(llr):
            b = llr.shape[0]
            cap = max(8, int(b * cfg.triage_cap_frac))
            if cap >= b:
                return full(llr)
            return decode_two_phase(fast, full, full, llr, cap)

        return fn

    def _make_crc_accept(self):
        """Wrap the (kernel, possibly triage-wrapped) decoder with CRC- /
        outer-code-aided acceptance: syndrome-converged frames failing the
        integrity check are re-decoded by the bit-exact check-aware jnp
        path at the full budget (ops/crc_accept.py)."""
        import dataclasses

        from .ops.bp import accept_fail_fn
        from .ops.crc_accept import decode_with_crc_accept

        cfg = self.config
        fail = accept_fail_fn(self.code, cfg)
        retry_cfg = dataclasses.replace(
            cfg, implementation="jnp", triage_iters=0
        )
        retry_full = partial(decode_qc, self.code, retry_cfg)
        inner = self._fn

        @jax.jit
        def fn(llr):
            cap = max(8, int(llr.shape[0] * cfg.triage_cap_frac))
            return decode_with_crc_accept(inner, retry_full, fail, llr, cap)

        return fn

    def __call__(self, llr: jax.Array) -> DecodeResult:
        if llr.ndim != 2 or llr.shape[-1] != self.code.n:
            raise ValueError(
                f"expected llr of shape [batch, {self.code.n}], got {llr.shape}"
            )
        return self._fn(llr.astype(jnp.float32))

    def info_bits(self, result: DecodeResult) -> jax.Array:
        """Information bits of the decoded codewords: [B, k_info]."""
        pos = getattr(self.code, "info_positions", None)
        if pos is None:
            return result.bits[:, : self.code.k]
        return result.bits[:, jnp.asarray(pos)]

    def lower(self, batch_size: int):
        """Lower/compile for a fixed batch size (for AOT benchmarking)."""
        shape = jax.ShapeDtypeStruct((batch_size, self.code.n), jnp.float32)
        fn = self._fn if hasattr(self._fn, "lower") else jax.jit(self._fn)
        return fn.lower(shape)
