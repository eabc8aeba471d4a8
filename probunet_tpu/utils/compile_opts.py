"""Tuned XLA:TPU compiler options, threaded into every jitted step.

Why PJRT ``compiler_options`` and not ``XLA_FLAGS``: on a remote-attached
(axon-tunnel) backend the ``XLA_FLAGS`` string is parsed by the *client*
process, whose XLA build does not register the TPU backend's flags —
``parse_flags_from_env`` aborts the process on any ``--xla_tpu_*`` flag
(measured: every flag of the round-3 ladder). PJRT ``compiler_options``
travel with each compile RPC and are validated by the server-side
compiler (a bogus key raises ``JaxRuntimeError``), so they are the only
channel that reaches the TPU compiler here — and the better one anyway:
scoped per-computation instead of per-process.

``PROBUNET_XLA_OPTS`` holds ``key=value`` pairs separated by ``;``:

    PROBUNET_XLA_OPTS="xla_tpu_rwb_fusion=true;xla_tpu_scoped_vmem_limit_kib=65536"

Empty string / ``none`` disables tuning entirely. Unset selects
``_TPU_DEFAULTS`` (measured winners; empty until a ladder run earns an
entry) on TPU and nothing elsewhere. Read at STEP-BUILD time: changing
the env var after a step function was built has no effect on it.
"""

from __future__ import annotations

import os

import jax

# Measured-winner defaults applied on TPU when PROBUNET_XLA_OPTS is unset.
# Every entry must cite its A/B run (DESIGN.md "compiler-option ladder").
_TPU_DEFAULTS: dict[str, str] = {}


def tuned_compiler_options() -> dict[str, str] | None:
    """The compiler_options dict for jitted steps (None = compiler defaults)."""
    spec = os.environ.get("PROBUNET_XLA_OPTS")
    if spec is None:
        # Cheap check first: with no defaults there is nothing to apply, and
        # jax.default_backend() would force backend initialization at
        # step-build time (possibly before a PROBUNET_PLATFORM override).
        if _TPU_DEFAULTS and jax.default_backend() == "tpu":
            return dict(_TPU_DEFAULTS)
        return None
    spec = spec.strip()
    if spec in ("", "none"):
        return None
    out: dict[str, str] = {}
    for pair in spec.split(";"):
        pair = pair.strip()
        if not pair:
            continue
        if "=" not in pair:
            raise ValueError(
                f"PROBUNET_XLA_OPTS entry {pair!r} is not key=value")
        k, v = pair.split("=", 1)
        out[k.strip()] = v.strip()
    return out or None
