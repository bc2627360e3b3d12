"""Device-placement helpers for build-time probe computations.

The game builders run small numeric validation probes (bandwidth checks,
affine-Jacobian probes — game_builder.py, kernels/block_tridiag.py). Those
are one-shot host-side analyses whose outputs are static metadata; running
them on the default accelerator wastes a full compile round-trip per probe.
On the axon TPU tunnel this dominated the driver bench's wall-clock:
round-4 measurement showed 360 s of the 387 s `bench.py` run was problem
build — i.e. probe compiles through the tunnel — vs 27 s for the actual
solve (logs/tpu_queue_r4/01_headline.log). Probes therefore run on the CPU
backend whenever one is available.
"""

from __future__ import annotations

import contextlib

import jax


def enable_host_probe_backend() -> bool:
    """Make the CPU backend available ALONGSIDE the default accelerator.

    On this image a sitecustomize pins ``JAX_PLATFORMS=axon``, which
    restricts jax to the TPU backend only; appending ``,cpu`` keeps axon the
    default for real compute while letting `probes_on_cpu` place build-time
    probes locally. Call before any jax computation (backend init latches
    the platform list). Returns True when a CPU backend is available."""
    try:
        cur = jax.config.jax_platforms
    except AttributeError:  # pragma: no cover - very old jax
        return True
    if cur:
        platforms = [p for p in cur.split(",") if p]
        if "cpu" not in platforms:
            try:
                jax.config.update("jax_platforms", ",".join(platforms + ["cpu"]))
            except Exception:  # pragma: no cover - backend already latched
                return False
    try:
        return len(jax.devices("cpu")) > 0
    except Exception:
        return False


def persistent_cache_dir() -> str:
    """The persistent-cache directory (compile cache + staged artifacts):
    MCPTPU_CACHE_DIR if set; else <repo-root>/.jax_cache_tpu for an
    editable install; else a user-cache location (ADVICE r4)."""
    import os

    cache_dir = os.environ.get("MCPTPU_CACHE_DIR")
    if cache_dir:
        return cache_dir
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    candidate = os.path.join(root, ".jax_cache_tpu")
    if os.path.basename(root) == "site-packages" or not os.access(
        root, os.W_OK
    ):
        candidate = os.path.join(
            os.path.expanduser("~"), ".cache", "mcp_tpu", "jax_cache"
        )
    return candidate


def configure_tpu_cache(min_compile_secs: float = 1.0) -> bool:
    """One-stop TPU entry-point setup: point jax's persistent compilation
    cache at ``<repo-root>/.jax_cache_tpu`` (the 5-20 min tunnel compiles
    amortize across runs) and register the CPU probe backend. Replaces the
    copy-pasted try/except block every bench/script used to carry — one
    missed copy silently recompiled every program through the tunnel.
    Returns whether the CPU probe backend is available."""
    import os

    try:
        cache_dir = persistent_cache_dir()
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
    return enable_host_probe_backend()


def cpu_probe_device():
    """The CPU device probes should run on, or None if unavailable
    (e.g. platform list pinned to the accelerator only)."""
    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


@contextlib.contextmanager
def probes_on_cpu():
    """Context: run eager/jitted probe computations on the CPU backend when
    one is available; no-op otherwise. Outputs used as jit constants later
    are device-neutral (embedded at trace time), so placement here only
    affects where the probe itself compiles and runs."""
    dev = cpu_probe_device()
    if dev is None:
        yield
    else:
        with jax.default_device(dev):
            yield
