"""AOT-exported program cache: the actual cold-start fix.

Measured on the v5e chip: a fresh process's first commit call costs
minutes even with a WARM persistent XLA compile cache — the time is
client-side Pallas/Mosaic LOWERING (~45 s per kernel shape), which runs
BEFORE the compile cache is consulted (the cache keys on the lowered
program). `jax.export` serializes the lowered program — Mosaic custom
calls included — so a fresh process skips lowering entirely:

    no artifacts:            first call ~265-600 s
    artifact, cold XLA cache: first call ~37 s  (XLA compile only)
    artifact + warm cache:    first call ~3.5 s

Artifacts live next to the SRS caches (cache/aot_*.jaxexp), keyed by a
digest of the kernel source files + jax version + device kind, so stale
artifacts are never reused after a code or platform change. Any failure
(old jax, platform mismatch, corrupt file) falls back to the normal jit
path. LWKZG_AOT=0 disables.
"""

import hashlib
import os
from typing import Tuple

_cache = {}  # key -> deserialized jax.export.Exported
_code_digest_memo = None
_src_digest_memo = None

_SRC_MODULES = (
    "limbs",
    "field_ops",
    "formulas",
    "g1_ops",
    "pallas_g1",
    "pallas_g1_v2",
    "dispatch",
    "msm",
)


def _src_digest() -> str:
    """Digest of the kernel sources + jax version (platform-independent —
    what `make check-aot` / tests/test_aot_guard.py compare against)."""
    global _src_digest_memo
    if _src_digest_memo is None:
        import jax

        h = hashlib.sha256()
        base = os.path.dirname(__file__)
        for mod in _SRC_MODULES:
            with open(os.path.join(base, mod + ".py"), "rb") as f:
                h.update(f.read())
        h.update(jax.__version__.encode())
        _src_digest_memo = h.hexdigest()[:16]
    return _src_digest_memo


def _code_digest() -> str:
    global _code_digest_memo
    if _code_digest_memo is None:
        h = hashlib.sha256(_src_digest().encode())
        try:
            import jax

            h.update(jax.devices()[0].device_kind.encode())
        except Exception:
            pass
        _code_digest_memo = h.hexdigest()[:16]
    return _code_digest_memo


def _index_path() -> str:
    from ..models.srs import _CACHE_DIR

    return os.path.join(_CACHE_DIR, "aot_index.json")


def _index_record(key: str, name: str, sig: str, static) -> None:
    """Sidecar index: artifact key -> provenance. Round 2 shipped stale
    artifacts silently (kernels edited after prewarm, digest missed, cold
    start regressed ~50x — VERDICT.md Weak #3); the guard test fails
    loudly when any recorded artifact's src digest != the current one."""
    import json

    path = _index_path()
    try:
        idx = {}
        if os.path.exists(path):
            with open(path) as f:
                idx = json.load(f)
        idx[key] = {
            "name": name,
            "sig": sig,
            "static": str(static),
            "src_digest": _src_digest(),
        }
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(idx, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except OSError:  # cache dir read-only: artifacts are best-effort
        pass


def enabled() -> bool:
    if os.environ.get("LWKZG_AOT") == "0":
        return False
    try:
        import jax

        return jax.default_backend() == "tpu" and hasattr(jax, "export")
    except Exception:  # pragma: no cover
        return False


def _artifact_path(key: str) -> str:
    from ..models.srs import _CACHE_DIR

    return os.path.join(_CACHE_DIR, f"aot_{key}.jaxexp")


def call(name: str, jit_fn, args: Tuple, static: Tuple = ()):
    """Run `jit_fn(*args, **dict(static))` through an AOT-exported
    program when possible (TPU only); transparently falls back."""
    if not enabled():
        return jit_fn(*args, **dict(static))
    import jax

    sig = ";".join(f"{a.shape}{a.dtype}" for a in args)
    key = hashlib.sha256(
        f"{name}|{sig}|{static}|{_code_digest()}".encode()
    ).hexdigest()[:20]
    exp = _cache.get(key)
    if exp is None:
        path = _artifact_path(key)
        try:
            if os.path.exists(path):
                with open(path, "rb") as f:
                    exp = jax.export.deserialize(f.read())
            else:
                exp = jax.export.export(jit_fn)(*args, **dict(static))
                blob = exp.serialize()
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
                _index_record(key, name, sig, static)
                # call through the DESERIALIZED form: the exporting
                # process would otherwise compile a not-bit-identical
                # program and pollute the persistent XLA cache with a
                # key no later (deserializing) process can hit
                exp = jax.export.deserialize(blob)
            # jit the exported call: a bare exp.call() re-traces and
            # BLOCKS per invocation (measured: the 16-deep pipelined
            # commit dispatch serialized to one ~44 ms tunnel RTT per
            # MSM instead of ~14 ms/blob overlapped); under jit the
            # call_exported computation dispatches async like any
            # compiled program
            exp = jax.jit(exp.call)
            _cache[key] = exp
        except Exception as e:  # pragma: no cover - fallback path
            import sys

            print(
                f"[lambdaworks_kzg_tpu] AOT path unavailable for {name} "
                f"({e!r}); using the jit path",
                file=sys.stderr,
            )
            _cache[key] = False
            exp = False
    if exp is False:
        return jit_fn(*args, **dict(static))
    return exp(*args)
