"""On-backend implementation self-check: equality + timing for every
backend-dispatched implementation pair.

Run via ``bench.py --check``.  For each dispatch point (the payload
window grab, the S&C sync impl, the matched-filter method) every
candidate implementation is run COMPILED on the attached backend against
the same operating-point inputs the decode uses; outputs are asserted
equal to the safe-fallback impl's, and per-impl sustained device
milliseconds are written to the committed table
``rub_mimo_tpu/data/impl_timings.json`` that the ``"auto"`` dispatches
consult (utils.impl_select).  An impl that fails equality is recorded
with ``equal: false`` and can never win an auto dispatch; an impl that
is slow is recorded slow and loses on measurement.  This is the
structural fix for round 2's shipped 70x window regression (BENCH_r02):
no hardcoded backend branch can route the decode through an unmeasured
kernel again.

Pallas candidates ("dynwin", "pallas" sync) are only measured on TPU —
interpret mode is not a measurement and non-TPU backends never dispatch
to them anyway.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


@functools.lru_cache(maxsize=1)
def _reducer():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def reduce_all(ls):
        tot = jnp.float32(0.0)
        for l in ls:
            if jnp.issubdtype(l.dtype, jnp.complexfloating):
                tot += jnp.sum(jnp.abs(l)).astype(jnp.float32)
            else:
                tot += jnp.sum(l.astype(jnp.float32))
        return tot

    return reduce_all


def _hard_sync(out):
    """Fetch-backed barrier: `block_until_ready` returns before execution
    on the tunneled axon attachment, so sync through a dependent scalar
    fetched to the host (see bench.py)."""
    import jax

    from rub_mimo_tpu.utils.transfer import to_host

    leaves = list(jax.tree_util.tree_leaves(out))
    return float(np.asarray(to_host(_reducer()(leaves))))


def _sustained_ms(fn, args, iters: int) -> float:
    out = fn(*args)
    _hard_sync(out)  # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _hard_sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


@functools.lru_cache(maxsize=1)
def _comparator():
    """Jitted on-device equality: large arrays (the [2, 2.2M] payload)
    cannot be fetched through the tunneled attachment (UNIMPLEMENTED on
    >~MB transfers), so equality is computed on device and only the
    boolean comes back."""
    import functools as _ft

    import jax
    import jax.numpy as jnp

    @_ft.partial(jax.jit, static_argnames=("exact",))
    def equal(a_leaves, b_leaves, exact):
        ok = jnp.bool_(True)
        for a, b in zip(a_leaves, b_leaves):
            ct = jnp.result_type(a.dtype, b.dtype)
            a, b = a.astype(ct), b.astype(ct)
            same = jnp.all(a == b)
            if not exact and np.dtype(ct).kind in "fc":
                d = jnp.abs(a - b)
                tol = 1e-5 + 1e-4 * jnp.abs(b)
                same = same | jnp.all(d <= tol)
            ok = ok & same
        return ok

    return equal


def _equal(a_tree, b_tree, *, exact: bool) -> bool:
    import jax

    from rub_mimo_tpu.utils.transfer import to_host

    a_leaves = list(jax.tree_util.tree_leaves(a_tree))
    b_leaves = list(jax.tree_util.tree_leaves(b_tree))
    if len(a_leaves) != len(b_leaves):
        return False
    if any(a.shape != b.shape for a, b in zip(a_leaves, b_leaves)):
        return False
    return bool(np.asarray(to_host(
        _comparator()(a_leaves, b_leaves, exact=exact)
    )))


def run_check(frames: int = 1000, iters: int = 12, verbose: bool = False,
              write: bool = True) -> dict:
    """Measure + equality-check every dispatched impl on the attached
    backend; merge results into the committed table and return them."""
    import jax
    import jax.numpy as jnp

    from rub_mimo_tpu.config import ModemConfig
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx
    from rub_mimo_tpu.sync import matched_filter, schmidl_cox
    from rub_mimo_tpu.utils import impl_select

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    cfg = ModemConfig(pid_max=frames, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=5000, seed=42)
    capture, _, _ = simulator.simulate_capture(cfg, spec)
    capture = jax.device_put(jnp.asarray(capture))
    S, T = capture.shape

    results: dict = {}

    def log(msg):
        if verbose:
            import sys

            print(msg, file=sys.stderr, flush=True)

    # ---- shared stage inputs: sync point + estimation region ----
    sync = jax.jit(
        lambda x: schmidl_cox.synchronize(x, cfg, impl="coarse")
    )(capture)
    sync_index = sync.sync_index
    region = jax.jit(
        lambda x, si: rx._extract_region(x, si, cfg)
    )(capture, sync_index)

    # ---- point: payload window grab (the r02 regression site) ----
    plen = cfg.pid_max * cfg.symbol_len
    # representative cstart: unaligned, mid-capture, like a real decode's
    cstart = (jnp.clip(sync_index, 0, T) + 41 * cfg.symbol_len + 77).astype(
        jnp.int32
    )
    window_impls = ["xla"] + (["dynwin"] if on_tpu else [])
    point = {}
    ref = None
    for impl in window_impls:
        fn = jax.jit(
            lambda x, s, impl=impl: rx.extract_payload(x, s, plen, impl=impl)
        )
        try:
            out = fn(capture, cstart)
            if impl == impl_select.FALLBACKS["window"]:
                ref = out
            eq = ref is not None and _equal(out, ref, exact=True)
            ms = _sustained_ms(fn, (capture, cstart), iters)
            point[impl] = {"device_ms": round(ms, 4), "equal": bool(eq)}
        except Exception as e:  # a broken impl must be recorded, not fatal
            point[impl] = {"device_ms": None, "equal": False,
                           "error": f"{type(e).__name__}: {e}"[:200]}
        log(f"window/{impl}: {point[impl]}")
    results["window"] = point

    # ---- point: S&C sync impl ----
    sync_impls = ["coarse", "xla"] + (["pallas"] if on_tpu else [])
    point = {}
    ref = None
    for impl in sync_impls:
        fn = jax.jit(
            lambda x, impl=impl: schmidl_cox.synchronize(x, cfg, impl=impl)
        )
        try:
            r = fn(capture)
            # compare the integer decisions (synced / t* / index / starts)
            # exactly; cfo is float and impl-order-sensitive — allclose
            ints = (r.synced, r.sync_sample, r.sync_index,
                    r.plateau_start, r.plateau_end)
            if impl == impl_select.FALLBACKS["sync"]:
                ref = (ints, r.cfo_hat)
            eq = (
                ref is not None
                and _equal(ints, ref[0], exact=True)
                and _equal(r.cfo_hat, ref[1], exact=False)
            )
            ms = _sustained_ms(fn, (capture,), iters)
            point[impl] = {"device_ms": round(ms, 4), "equal": bool(eq)}
        except Exception as e:
            point[impl] = {"device_ms": None, "equal": False,
                           "error": f"{type(e).__name__}: {e}"[:200]}
        log(f"sync/{impl}: {point[impl]}")
    results["sync"] = point

    # ---- point: matched-filter method ----
    point = {}
    ref = None
    for method in ["xcorr", "direct"]:
        fn = jax.jit(
            lambda w, m=method: matched_filter.search(w, cfg, method=m)
        )
        try:
            r = fn(region)
            idx = (r.s0_index, r.ac_index)
            if method == impl_select.FALLBACKS["matched_filter"]:
                ref = idx
            eq = ref is not None and _equal(idx, ref, exact=True)
            ms = _sustained_ms(fn, (region,), iters)
            point[method] = {"device_ms": round(ms, 4), "equal": bool(eq)}
        except Exception as e:
            point[method] = {"device_ms": None, "equal": False,
                             "error": f"{type(e).__name__}: {e}"[:200]}
        log(f"matched_filter/{method}: {point[method]}")
    results["matched_filter"] = point

    if write:
        path = impl_select.table_path()
        try:
            with open(path) as f:
                table = json.load(f)
        except (OSError, ValueError):
            table = {}
        table[backend] = results
        table.setdefault("_meta", {})[backend] = {
            "method": "sustained_wall (fetch-backed barrier)",
            "note": "absolute ms include per-dispatch tunnel overhead "
                    "(~1-3 ms on the axon attachment); RELATIVE ordering "
                    "within a dispatch point is what auto selection uses",
            "frames": frames,
            "iters": iters,
            "capture_shape": [int(S), int(T)],
        }
        with open(path, "w") as f:
            json.dump(table, f, indent=2, sort_keys=True)
            f.write("\n")
        impl_select.reload_table()
        impl_select.best_impl.cache_clear()
    return {backend: results}
