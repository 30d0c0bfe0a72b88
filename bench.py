"""Benchmark: CG matvec throughput on the BASELINE.md headline config.

Holstein honeycomb L=12, beta=12, dtau=0.05 (Ltau=240, N=288 sites): times the
innermost hot operation of the whole framework — the M^T M space-time matvec
(2 checkerboard sweeps x 2 + diagonal scalings per application,
BASELINE.md per-sweep cost model) — on the default device, and compares against
the same computation pinned to one host CPU core (stand-in for the reference's
single-core Julia loop nest, which performs the identical memory-bound sweeps).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _cache_dir() -> str:
    """Per-user cache location, overridable via SMOQY_JAX_CACHE_DIR — a fixed
    world-writable /tmp path risks cross-user collisions on shared hosts."""
    import getpass
    import tempfile

    env = os.environ.get("SMOQY_JAX_CACHE_DIR")
    if env:
        return env
    try:
        user = getpass.getuser()
    except Exception:  # pragma: no cover
        user = f"uid{os.getuid()}"
    return os.path.join(tempfile.gettempdir(), f"smoqy_jax_cache_{user}")


def _enable_compile_cache():
    """Persistent XLA compilation cache for the LARGE programs (sweep /
    walker-sweep / measured pass): on a small host their compiles dominate
    wall time (142s -> 34s measured for the sweep program on a warm cache).

    Deliberately enabled only AFTER the matvec stage: on the tunneled axon
    backend the cache-hit path for the small matvec loop program is
    pathologically SLOW (87s cache-free vs 241-368s with a warm cache,
    measured twice) — consistent with the terminal/client libtpu version skew
    rejecting deserialized executables (see MULTICHIP_r01 error text) and
    falling back slowly. The big programs load fine and fast."""
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _drain(x) -> None:
    """Execution barrier that actually works on the tunneled axon backend:
    jax.block_until_ready can return while executions are still deferred
    (measured: a queue of production sweeps then drains ~1000x slower than
    synchronous stepping), so timed loops pull ONE tiny scalar per iteration
    — the same per-sweep sync the production driver performs (driver._sync)."""
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def build_case(L=12, beta=12.0, dtau=0.05, alpha=0.6, Omega=1.0, seed=0):
    from smoqyelphqmc_tpu import (
        Bond,
        ElectronPhononModel,
        ElectronPhononParameters,
        HolsteinCoupling,
        Lattice,
        ModelGeometry,
        PhononMode,
        TightBindingModel,
        TightBindingParameters,
        UnitCell,
    )
    from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
    from smoqyelphqmc_tpu.ops.checkerboard import build_checkerboard_structure
    from smoqyelphqmc_tpu.ops.fermion_det import FermionDetMatrix

    uc = UnitCell(
        lattice_vecs=[[1.5, np.sqrt(3) / 2], [1.5, -np.sqrt(3) / 2]],
        basis_vecs=[[0.0, 0.0], [1.0, 0.0]],
    )
    lat = Lattice(L=[L, L], periodic=[True, True])
    geo = ModelGeometry(uc, lat)
    bonds = [
        Bond(orbitals=(0, 1), displacement=[0, 0]),
        Bond(orbitals=(0, 1), displacement=[-1, 0]),
        Bond(orbitals=(0, 1), displacement=[0, -1]),
    ]
    for b in bonds:
        geo.add_bond(b)
    tbm = TightBindingModel(geo, bonds, [1.0] * 3, [0.0, 0.0], mu=0.0)
    em = ElectronPhononModel(geo, tbm)
    p1 = em.add_phonon_mode(PhononMode([0.0, 0.0], Omega))
    p2 = em.add_phonon_mode(PhononMode([1.0, 0.0], Omega))
    em.add_holstein_coupling(HolsteinCoupling(p1, 0, [0, 0], alpha, ph_sym_form=True))
    em.add_holstein_coupling(HolsteinCoupling(p2, 1, [0, 0], alpha, ph_sym_form=True))
    rng = np.random.default_rng(seed)
    tbp = TightBindingParameters.from_model(tbm, rng)
    elph = ElectronPhononParameters.from_model(beta, dtau, em, tbp, rng)
    fpi = build_path_integral(tbp, elph)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    fdm = FermionDetMatrix.from_path_integral(fpi, structure, symmetric=True)
    return fdm


def build_sim(L=12, beta=12.0, dtau=0.05, alpha=0.6, Omega=1.0, Nt=24, tol=1e-10, seed=0):
    """Full QMC context/state for sweep-level benchmarking."""
    import numpy as np

    from smoqyelphqmc_tpu.models.electron_phonon import ElectronPhononParameters
    from smoqyelphqmc_tpu.models.tight_binding import TightBindingParameters
    from smoqyelphqmc_tpu.updates.context import initialize_qmc

    import importlib.util, os, sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples"))
    from _common import holstein_honeycomb_model

    geo, tbm, em = holstein_honeycomb_model(L, Omega, alpha, 0.0)
    rng = np.random.default_rng(seed)
    tbp = TightBindingParameters.from_model(tbm, rng)
    elph = ElectronPhononParameters.from_model(beta, dtau, em, tbp, rng)
    ctx, state = initialize_qmc(
        tbp, elph, seed=seed, tol=tol, preconditioner="spectral", force_dtype="float32",
        mixed_precision=True,
    )
    return ctx, state


def bench_sweeps(n_sweeps=8, n_discard=2, Nt=24, sim=None):
    """Full QMC sweeps (reflection + swap + EFA-PFF-HMC) per second, plus the
    average CG iterations per solve inside the HMC trajectory.

    Window discipline (VERDICT round 4, item 1): the first call compiles, and
    the first 1-2 post-compile batches still run at ~half steady state on this
    backend, so `n_discard` post-compile sweeps are executed (and synced)
    before the >= `n_sweeps`-sweep timed window opens."""
    import jax
    import jax.numpy as jnp

    from smoqyelphqmc_tpu.updates.global_updates import reflection_update, swap_update
    from smoqyelphqmc_tpu.updates.hmc import HMCParams, hmc_update

    ctx, state = build_sim(Nt=Nt) if sim is None else sim
    params = HMCParams(Nt=Nt)

    @jax.jit
    def sweep(s, iters_acc):
        s, _ = reflection_update(ctx, s)
        s, _ = swap_update(ctx, s)
        s, h = hmc_update(ctx, s, params)
        # accumulate INSIDE the jit: a separate eager add per sweep costs a
        # dispatch roundtrip over the tunneled device
        return s, iters_acc + h.iters_avg

    # strong-typed accumulator: a weak-typed jnp.asarray(0.0) seed would make
    # the second call (which receives the strong-typed result) recompile the
    # whole sweep inside the timed loop
    iters = jnp.zeros((), jnp.float64)
    for _ in range(1 + n_discard):  # compile + warm-up batches
        state, iters = sweep(state, iters)
        _drain(iters)
    iters = jnp.zeros((), jnp.float64)
    t0 = time.perf_counter()
    for _ in range(n_sweeps):
        state, iters = sweep(state, iters)
        _drain(iters)  # per-iteration barrier (see _drain)
    dt = time.perf_counter() - t0
    return n_sweeps / dt, float(iters) / n_sweeps


def bench_walker_sweeps(W=8, n_sweeps=6, n_discard=2, Nt=24, sim=None):
    """Aggregate walker-sweeps/sec with W chains batched on one chip — the
    per-iteration cost is latency-bound, so batching walkers through the same
    CG is nearly free throughput (parallel/walkers.py). Same window discipline
    as bench_sweeps: compile + n_discard warm batches, then a timed window."""
    import jax

    from smoqyelphqmc_tpu.parallel.walkers import init_walker_states, walker_sweep
    from smoqyelphqmc_tpu.updates.hmc import HMCParams

    ctx, state0 = build_sim(Nt=Nt) if sim is None else sim
    states = init_walker_states(ctx, state0, W, seed=1)
    params = HMCParams(Nt=Nt)
    step = jax.jit(lambda s: walker_sweep(ctx, s, params))
    for _ in range(1 + n_discard):  # compile + warm-up batches
        states, _ = step(states)
        _drain(states.key)
    t0 = time.perf_counter()
    for _ in range(n_sweeps):
        states, _ = step(states)
        _drain(states.key)  # per-iteration barrier (see _drain)
    return n_sweeps * W / (time.perf_counter() - t0)


def bench_walker_measured(W=8, n_sweeps=6, n_discard=2, Nt=24, Nrv=10, sim=None,
                          k_scan=1):
    """Aggregate MEASURED walker-sweeps/sec: one full update sweep plus one
    estimator refresh + full tutorial measurement pass per walker per sweep —
    the end-to-end production rate of the flagship config. Window: compile +
    n_discard warm batches discarded, then >= n_sweeps timed (steady state).

    k_scan > 1 fuses k measured sweeps into one dispatched executable with
    device-side bin accumulation — exactly the production driver's
    cfg.sweeps_per_dispatch batching — so the per-dispatch tunnel overhead
    amortizes k-fold. Each timed call still ends in one honest drain."""
    import jax

    from smoqyelphqmc_tpu.measure.container import MeasurementSpec, make_measurements
    from smoqyelphqmc_tpu.measure.greens_estimator import (
        build_greens_estimator,
        update_greens_estimator,
    )
    from smoqyelphqmc_tpu.parallel.walkers import init_walker_states, walker_sweep
    from smoqyelphqmc_tpu.updates.context import make_fdm
    from smoqyelphqmc_tpu.updates.hmc import HMCParams

    ctx, state0 = build_sim(Nt=Nt) if sim is None else sim
    import _common  # examples path inserted by build_sim

    geo = _common.holstein_honeycomb_model(12, 1.0, 0.6, 0.0)[0]
    spec = _common.holstein_honeycomb_spec(geo)
    states = init_walker_states(ctx, state0, W, seed=1)
    params = HMCParams(Nt=Nt)
    est0 = build_greens_estimator(ctx.elph.Ltau, geo.n_orbitals, geo.L, Nrv=Nrv, dtype="float32")

    @jax.jit
    def sweep_and_measure(states, key):
        states, _ = walker_sweep(ctx, states, params)
        keys = jax.random.split(key, W + 1)

        def one(state, k):
            fdm = make_fdm(ctx, state.x)
            upd = update_greens_estimator(
                est0, fdm, k, precond=state.precond, tol=ctx.tol, maxiter=ctx.maxiter,
                mixed=ctx.mixed_precision, solve_dtype="float32",
            )
            return make_measurements(ctx, spec, upd.estimator, state.x)

        out = jax.vmap(one)(states, keys[1:])
        return states, out, keys[0]

    import jax.numpy as jnp

    if k_scan > 1:
        # production sweeps_per_dispatch batching: scan the SAME body with
        # device-side bin-sum accumulation (mirrors driver.measured_k_mw)
        sums0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype),
            jax.eval_shape(
                lambda s, k: sweep_and_measure(s, k)[1],
                states, jax.random.PRNGKey(0),
            ),
        )

        @jax.jit
        def sweep_k(states, key, sums):
            def body(carry, _):
                states, key, sums = carry
                states, out, key = sweep_and_measure(states, key)
                sums = jax.tree_util.tree_map(jnp.add, sums, out)
                return (states, key, sums), None

            (states, key, sums), _ = jax.lax.scan(
                body, (states, key, sums), None, length=k_scan
            )
            return states, key, sums

        key = jax.random.PRNGKey(7)
        sums = sums0
        for _ in range(1 + n_discard):  # compile + warm-up batches
            states, key, sums = sweep_k(states, key, sums)
            _drain(key)
        t0 = time.perf_counter()
        for _ in range(n_sweeps):
            states, key, sums = sweep_k(states, key, sums)
            _drain(key)  # one honest drain per k-sweep dispatch
        return n_sweeps * k_scan * W / (time.perf_counter() - t0)

    key = jax.random.PRNGKey(7)
    for _ in range(1 + n_discard):  # compile + warm-up batches
        states, out, key = sweep_and_measure(states, key)
        _drain(key)
    t0 = time.perf_counter()
    for _ in range(n_sweeps):
        states, out, key = sweep_and_measure(states, key)
        _drain(key)  # per-iteration barrier (see _drain)
    return n_sweeps * W / (time.perf_counter() - t0)


def bench_matvecs(n_iters=200, batch=2) -> float:
    """Return M^T M applications per second (one application = one batched field)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    fdm = build_case()

    v0 = jnp.asarray(np.random.default_rng(1).standard_normal((batch, fdm.Ltau, fdm.n_sites)))

    @jax.jit
    def loop(v):
        def body(_, v):
            v = fdm.mul_MtM(v)
            # rescale to prevent overflow over many applications
            return v / jnp.sqrt(jnp.mean(v * v))

        return lax.fori_loop(0, n_iters, body, v)

    _drain(loop(v0))  # compile
    t0 = time.perf_counter()
    _drain(loop(v0))
    dt = time.perf_counter() - t0
    return n_iters / dt


def numpy_mtm(fdm):
    """Pure-NumPy M^T M closure over a (symmetric, real-hopping) fdm's host
    tables — the timed kernel of bench_matvecs_numpy, factored out so tests can
    assert it agrees with the XLA kernel (tests/test_bench_numpy.py)."""
    n_colors = fdm.cb.n_colors
    C = np.asarray(fdm.cb.C)  # (n_colors, Ltau, N)
    S = np.asarray(fdm.cb.S)
    partner = np.asarray(fdm.cb.partner)  # (n_colors, N) int
    exp_nV = np.asarray(fdm.exp_nV)  # (Ltau, N)
    Ltau = fdm.Ltau
    sgn_first = np.full((Ltau, 1), -1.0)
    sgn_first[0, 0] = 1.0
    sgn_last = np.full((Ltau, 1), -1.0)
    sgn_last[Ltau - 1, 0] = 1.0
    assert fdm.symmetric and fdm.cb.S_im is None

    def apply_B(u):
        # symmetric factorization: CB^T (reversed colors) . exp(-dtau V) . CB
        for c in reversed(range(n_colors)):
            u = C[c] * u + S[c] * u[..., partner[c]]
        u = exp_nV * u
        for c in range(n_colors):
            u = C[c] * u + S[c] * u[..., partner[c]]
        return u

    def mul_MtM(v):
        u = apply_B(np.roll(v, 1, axis=-2))
        w = v + sgn_first * u  # M v
        u = apply_B(w)  # sym: B^T = B
        return w + sgn_last * np.roll(u, -1, axis=-2)  # M^T (M v)

    return mul_MtM


def bench_matvecs_numpy(n_iters=50, batch=2) -> float:
    """Implementation-independent single-core baseline: the SAME M^T M
    space-time matvec (4 checkerboard color sweeps + diagonal scaling + the
    antiperiodic tau-shift boundary) written in plain NumPy — no XLA anywhere
    in the timed loop (VERDICT round 2, item 6). NumPy's elementwise kernels
    and fancy-index gathers are single-threaded, mirroring the reference's
    single-core Julia loop nest (checkerboard_matrix_multiply.jl:26-72: the
    same per-hop 2x2 mixes, there SIMD-vectorized over tau on one core)."""
    fdm = build_case()
    mul_MtM = numpy_mtm(fdm)
    v = np.random.default_rng(1).standard_normal((batch, fdm.Ltau, fdm.n_sites))
    v = mul_MtM(v)  # touch everything once (page-in)
    v /= np.sqrt(np.mean(v * v))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        v = mul_MtM(v)
        v /= np.sqrt(np.mean(v * v))
    return n_iters / (time.perf_counter() - t0)


def _device_alive(timeout_s: float = 180.0) -> bool:
    """Probe the accelerator with a trivial op in a watchdog thread; a wedged
    device tunnel must not hang the benchmark."""
    import threading

    ok = []

    def probe():
        try:
            import jax
            import jax.numpy as jnp

            y = jax.jit(lambda a: (a * 2).sum())(jnp.ones((8, 128)))
            jax.block_until_ready(y)
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "device"
    if mode == "cpu-baseline":
        import jax

        jax.config.update("jax_platforms", "cpu")
        rate = bench_matvecs(n_iters=50)
        print(json.dumps({"cpu_rate": rate}))
        return

    if mode == "device-matvec":
        # isolated matvec stage: runs in its own process so (a) the parent can
        # HARD-bound its wall time (the tunneled device swings this stage
        # 32s <-> 405s, which starved every production stage in round 4) and
        # (b) the persistent compile cache stays off here — the small matvec
        # loop program's cache-hit path is pathologically slow on this backend
        # (see _enable_compile_cache)
        rate = bench_matvecs()
        print(json.dumps({"device_matvec_rate": rate}), flush=True)
        return

    # --- robustness scaffolding: the tunneled device has high wall-time
    # variance (a single stage was observed to swing 55s -> 368s between
    # identical runs). The headline JSON line must be recorded even if the
    # invoking driver times this process out, so (a) optional stages are
    # skipped when an internal budget runs low and (b) SIGTERM emits whatever
    # is complete and exits 0.
    t_start = time.perf_counter()
    budget = float(os.environ.get("SMOQY_BENCH_BUDGET_S", "520"))

    def remaining():
        return budget - (time.perf_counter() - t_start)

    # stable extras schema: every key always present (None until its stage
    # lands), so partial runs never KeyError downstream
    result = {
        "metric": "MtM matvecs/sec (Holstein honeycomb L=12, beta=12, Ltau=240, N=288, f64)",
        "value": None,
        "unit": "matvec/s",
        "vs_baseline": None,
        "extras": {
            "numpy_matvecs_per_sec": None,
            "vs_numpy_baseline": None,
            "measured8_sweeps_per_sec": None,
            "measured8_k6_sweeps_per_sec": None,  # sweeps_per_dispatch=6 batching
            "walker8_measured_sweeps_per_sec": None,  # legacy alias of measured8
            "hmc_sweeps_per_sec": None,
            "cg_iters_per_solve": None,
            "walker8_sweeps_per_sec": None,
        },
        "stages_completed": [],
    }
    _emitted = []

    def _emit(partial=False):
        if _emitted:
            return
        if partial:
            result["partial"] = True
        # mark BEFORE printing: if SIGTERM lands mid-print, the handler must
        # not re-enter and interleave a second JSON line with the first
        _emitted.append(True)
        print(json.dumps(result), flush=True)

    import signal

    def _on_term(signum, frame):  # pragma: no cover
        print(f"[bench] signal {signum}: emitting partial result", file=sys.stderr)
        _emit(partial=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    def _checkpoint():
        """Incremental partial artifact: rewrite BENCH_partial.json after every
        stage so a hard kill (SIGKILL — no handler possible) still leaves the
        completed stages on disk (VERDICT round 4, item 1)."""
        try:
            with open("BENCH_partial.json", "w") as f:
                json.dump(result, f, indent=1)
        except OSError:  # pragma: no cover
            pass

    def _stage(name, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"[bench] {name}: {time.perf_counter() - t0:.1f}s wall", file=sys.stderr)
        if out is not None:
            result["stages_completed"].append(name)
        _checkpoint()
        return out

    def _retry(fn, attempts=3, min_headroom_s=0.0):
        """The tunneled device occasionally drops a remote-compile connection;
        retry transient failures — but re-check the budget between attempts so
        a flaky stage cannot blow past the total budget on retries alone."""
        for k in range(attempts):
            if k > 0 and remaining() < min_headroom_s:
                print(
                    f"[bench] abandoning retries: {remaining():.0f}s budget left",
                    file=sys.stderr,
                )
                return None
            try:
                return fn()
            except Exception as e:  # pragma: no cover
                print(f"benchmark attempt {k + 1} failed: {e}", file=sys.stderr)
                time.sleep(5)
        return None

    def _optional(name, min_headroom_s, fn, apply):
        """Run an extras stage only if the internal budget allows (a skipped
        stage is logged; the headline JSON still prints)."""
        if remaining() < min_headroom_s:
            print(f"[bench] skipping {name}: {remaining():.0f}s budget left", file=sys.stderr)
            return
        out = _stage(name, lambda: _retry(fn, min_headroom_s=min_headroom_s / 2))
        if out is not None:
            apply(out)

    ex = result["extras"]
    here = os.path.dirname(os.path.abspath(__file__))

    # matvec stage: HARD-bounded subprocess FIRST — and BEFORE this process
    # opens its own device client, so the tunnel only ever sees one client at
    # a time. Round 4 ran it in-process and its 405s tunnel stall starved
    # every production stage; a subprocess gives a real timeout. Its success
    # also doubles as the device-aliveness probe.
    def _matvec_subprocess():
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "device-matvec"],
            capture_output=True, text=True, cwd=here,
            timeout=max(60.0, min(240.0, remaining() - 180.0)),
        )
        return json.loads(out.stdout.strip().splitlines()[-1])["device_matvec_rate"]

    rate = None
    try:
        rate = _stage("matvecs", _matvec_subprocess)
        result["value"] = round(rate, 2)
    except Exception as e:  # pragma: no cover
        print(f"[bench] matvec subprocess failed/timed out: {e}", file=sys.stderr)

    if rate is None and not _device_alive():
        # fall back to CPU so the driver still records a data point
        import jax

        jax.config.update("jax_platforms", "cpu")
        cpu_fb = bench_matvecs(n_iters=50)
        result["metric"] = (
            "MtM matvecs/sec (device unreachable — CPU fallback; "
            "Holstein honeycomb L=12, beta=12, f64)"
        )
        result["value"] = round(cpu_fb, 2)
        result["vs_baseline"] = 1.0
        _emit()
        return

    # compile cache for the LARGE sweep/measure programs (the small matvec
    # loop ran cache-free in its subprocess; see _enable_compile_cache)
    _enable_compile_cache()

    # ONE shared built sim across every production stage: each stage used to
    # rebuild its own host-side case (~10s each) on top of its compile
    sim = build_sim(Nt=24)

    # measured8 runs FIRST among in-process device stages: the end-to-end
    # production number must never be the one skipped on budget
    _optional(
        "measured8", 120.0, lambda: bench_walker_measured(W=8, sim=sim),
        lambda r: ex.update(
            measured8_sweeps_per_sec=round(r, 4),
            walker8_measured_sweeps_per_sec=round(r, 4),
        ),
    )
    _optional(
        "measured8k", 100.0,
        lambda: bench_walker_measured(W=8, sim=sim, k_scan=6, n_sweeps=3, n_discard=1),
        lambda r: ex.update(measured8_k6_sweeps_per_sec=round(r, 4)),
    )
    _optional(
        "sweeps", 100.0, lambda: bench_sweeps(sim=sim),
        lambda s: ex.update(
            hmc_sweeps_per_sec=round(s[0], 4), cg_iters_per_solve=round(s[1], 1)
        ),
    )
    _optional(
        "walker8", 80.0, lambda: bench_walker_sweeps(W=8, sim=sim),
        lambda r: ex.update(walker8_sweeps_per_sec=round(r, 4)),
    )

    if rate is None and remaining() > 150.0:
        # the bounded subprocess timed out earlier but the device is clearly
        # alive (production stages ran) — one in-process retry, smaller loop
        try:
            rate = _stage("matvecs-retry", lambda: bench_matvecs(n_iters=100))
            result["value"] = round(rate, 2)
        except Exception as e:  # pragma: no cover
            print(f"[bench] in-process matvec retry failed: {e}", file=sys.stderr)

    # host-only baselines LAST: they need no device, so they must never
    # displace a device stage on budget
    try:
        np_rate = _stage("numpy-baseline", bench_matvecs_numpy)
        ex["numpy_matvecs_per_sec"] = round(np_rate, 2)
        if rate is not None:
            ex["vs_numpy_baseline"] = round(rate / np_rate, 2)
    except Exception as e:  # pragma: no cover
        print(f"numpy baseline failed: {e}", file=sys.stderr)

    # single-core CPU baseline in a subprocess (same XLA kernels pinned to one
    # host core — the same-machine stand-in for single-core Julia sweeps)
    cpu_rate = None
    if remaining() > 30.0:
        env = dict(os.environ)
        env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_cpu_multi_thread_eigen=false"
        env["OMP_NUM_THREADS"] = "1"
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "cpu-baseline"],
                capture_output=True,
                text=True,
                timeout=max(30.0, min(300.0, remaining() - 10.0)),
                env=env,
                cwd=here,
            )
            cpu_rate = json.loads(out.stdout.strip().splitlines()[-1])["cpu_rate"]
            result["stages_completed"].append("cpu-baseline")
        except Exception as e:  # pragma: no cover
            print(f"cpu baseline failed: {e}", file=sys.stderr)
    if rate is not None and cpu_rate:
        result["vs_baseline"] = round(rate / cpu_rate, 2)
    elif rate is not None and ex["numpy_matvecs_per_sec"]:
        # fallback anchor so vs_baseline is never null when the device ran
        result["vs_baseline"] = round(rate / ex["numpy_matvecs_per_sec"], 2)
    _checkpoint()

    # block SIGTERM around the final print so a signal cannot truncate the line
    try:
        signal.pthread_sigmask(signal.SIG_BLOCK, {signal.SIGTERM})
    except (AttributeError, ValueError):  # pragma: no cover
        pass
    _emit()


if __name__ == "__main__":
    main()
