"""Benchmark: diffraction patterns/sec/chip on the tBL_WSe2 production workload.

Workload (BASELINE.md workload 1, reference demo/params/tBL_WSe2_reconstruct.yml
:16-28,113-178): 128x128 scan = 16,384 DPs of 128x128, 6 probe modes, 1 object
mode, 6 slices at dz = 2 A, batch 32 — so ONE iteration is a full 512-batch
epoch — Adam on (obja, objp, probe, probe_pos_shifts) at the demo's learning
rates, loss_single + loss_sparse, and the demo's 7 active constraints
(ortho_pmode, fix_probe_int, obj_rblur, obj_zblur, mirrored_amp, obja_thresh,
objp_postiv) applied every iteration. Measurements are forward-simulated from
a known object so the run also reports reconstruction quality (phase
correlation with ground truth), not just speed on noise.

Baseline note: the reference repo publishes no benchmark table (BASELINE.md).
The only repo-citable per-iteration timing is CHANGELOG.md:310 — 45 s/iter
over the 16,384-DP dataset after the loss_simlar optimization (unspecified
GPU) = 364 DPs/s. vs_baseline uses that number; treat it as indicative, not
an A100 measurement.

Robustness contract (the tunneled TPU backend is load-noisy and sometimes
refuses to initialize — see VERDICT r4 item 1):
  - backend init and the first device transfer retry with bounded backoff;
  - backend init and the first device op run inside BOUNDED daemon-thread
    probes: a dead tunnel makes them HANG in native code, where SIGALRM is
    never delivered (verified against a real outage 2026-08-18 — the
    watchdog alone cannot save the record);
  - a detected hang poisons this process's jax, so while budget allows the
    bench sleeps and RE-EXECS itself in fresh processes (the chip often
    comes back within minutes), forwarding the first successful record;
  - a COMPLETE JSON result line is printed and flushed as soon as the primary
    (tBL) leg finishes; later legs append fields and re-print, so the LAST
    stdout line is always a complete, parseable record even if a later leg
    hangs or the process is killed;
  - `device_ms_per_step` (and the PSO leg's `pso_device_ms_per_step`) are
    measured from a jax.profiler trace ('XLA Modules' device-lane time),
    immune to host/tunnel load noise;
  - a global watchdog (BENCH_BUDGET_S, default 2100 s) guarantees the process
    exits 0 with whatever it has;
  - an error record (value 0) carries `last_good`: the newest driver-captured
    measurement from the committed BENCH_r0*.json files, labeled historical —
    a dead-chip day cannot erase the perf record.

Prints ONE-or-more JSON lines; the final line is the full record:
{"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import glob
import gzip
import json
import os
import signal
import sys
import tempfile
import time

import numpy as np

REFERENCE_DPS_PER_SEC = 364.0  # 16384 DPs / 45 s-iter, reference CHANGELOG.md:310

N_SCANS = 16384
NPIX = 128
PMODE = 6
NZ = 6
BATCH = 32
SCAN_SIDE = 128
STEP_PX = 3
TIMED_ITERS = 8  # best-of; the tunneled chip's dispatch varies +-30% with load
QUALITY_ITERS = 10  # total iterations before the phase-correlation readout
PSO_QUALITY_ITERS = 12  # PSO leg: iterations before its phase-corr readout

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2100"))
_T_START = time.perf_counter()

# BENCH_SMOKE=1: tiny shapes on CPU — proves the harness machinery (staged
# JSON, retry, watchdog, trace parse, all four legs) end-to-end without the
# TPU. Never a performance record; the JSON carries "smoke": true.
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    N_SCANS, NPIX, PMODE, NZ, BATCH, SCAN_SIDE = 64, 32, 2, 2, 8, 8
    TIMED_ITERS, QUALITY_ITERS, PSO_QUALITY_ITERS = 2, 3, 3

LOSS_PARAMS = {
    "loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5},
    "loss_sparse": {"state": True, "weight": 0.1, "ln_order": 1},
}

CONSTRAINT_PARAMS = {
    "ortho_pmode": {"freq": 1},
    "fix_probe_int": {"freq": 1},
    "obj_rblur": {"freq": 1, "obj_type": "both", "kernel_size": 5, "std": 0.5},
    "obj_zblur": {"freq": 1, "obj_type": "both", "kernel_size": 5, "std": 1.0},
    "mirrored_amp": {"freq": 1, "relax": 0.1, "scale": 0.03, "power": 4.0},
    "obja_thresh": {"freq": 1, "relax": 0.0, "thresh": (0.98, 1.02)},
    "objp_postiv": {"freq": 1, "relax": 0.0},
}

UPDATE_PARAMS = {
    "obja": {"lr": 5e-4, "start_iter": 1},
    "objp": {"lr": 5e-4, "start_iter": 1},
    "probe": {"lr": 1e-4, "start_iter": 1},
    "probe_pos_shifts": {"lr": 1e-4, "start_iter": 1},
}


class BenchTimeout(Exception):
    pass


def _alarm_handler(signum, frame):  # noqa: ARG001
    raise BenchTimeout(f"global watchdog fired at {elapsed():.0f}s")


def elapsed():
    return time.perf_counter() - _T_START


def remaining():
    return BUDGET_S - elapsed()


def log(msg):
    print(f"[{elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)


def emit(result):
    """Print a complete JSON record and flush — callable repeatedly; the
    driver parses the LAST line of stdout."""
    print(json.dumps(result), flush=True)


def _attach_last_good(result):
    """On an error record (value 0), attach the newest driver-captured
    measurement from the committed BENCH_r0*.json files, clearly labeled as
    historical — a dead-chip day must not erase the perf record entirely."""
    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r0*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = rec.get("parsed") or {}
        if parsed.get("value", 0) > 0:
            best = {"round": rec.get("n"), "source": os.path.basename(path)}
            for k in ("value", "unit", "ms_per_step", "device_ms_per_step",
                      "pso_patterns_per_sec", "device"):
                if k in parsed:
                    best[k] = parsed[k]
    if best is None:  # no committed records (fresh checkout): pin r2's number
        best = {"round": 2, "source": "hardcoded (no BENCH_r0*.json found)",
                "value": 20643.7, "unit": "patterns/sec/chip",
                "ms_per_step": 1.55, "device": "TPU v5 lite0"}
    best["note"] = ("chip unreachable THIS run; these are the most recent "
                    "driver-captured measurements from a previous round, "
                    "NOT from this run")
    result["last_good"] = best


def _bounded(fn, timeout_s: float, what: str):
    """Run fn() in a daemon thread with a bounded join.

    An unreachable tunnel chip makes backend init (and sometimes the first
    device op) HANG in native code, not raise — and while the main thread is
    blocked there, CPython never delivers SIGALRM, so the global watchdog
    cannot fire either (verified empirically against a dead chip,
    2026-08-18: a 300 s alarm never ran and the process had to be SIGKILLed
    with no JSON on stdout). The main thread therefore must never call
    hang-capable device entry points directly."""
    import threading

    box: dict = {}

    def probe():
        try:
            box["out"] = fn()
        except Exception as e:  # noqa: BLE001
            box["err"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise BenchTimeout(
            f"{what} still hanging after {timeout_s:.0f}s — chip unreachable "
            "(the stuck probe thread keeps its lock, so retrying in-process "
            "cannot succeed)"
        )
    if "err" in box:
        raise box["err"]
    return box.get("out")


def _devices_probe(timeout_s: float):
    def probe():
        import jax

        return jax.devices()

    return _bounded(probe, timeout_s, "backend init")


def _fresh_process_retry():
    """After a detected backend hang this process's jax is poisoned (the
    stuck probe thread holds the backend-init lock forever), but the chip
    may come back within the driver's budget: sleep, then re-exec bench.py
    in a FRESH process and forward its record. Loops while budget allows.
    Returns True if a child produced a JSON record (already printed)."""
    if os.environ.get("BENCH_REEXEC") == "1":
        return False  # children do not recurse
    import subprocess

    attempt = 0
    while remaining() > 480:
        attempt += 1
        wait = min(240.0, remaining() - 420.0)
        log(f"hang retry {attempt}: sleeping {wait:.0f}s, then a fresh process")
        time.sleep(wait)
        child_budget = int(remaining() - 90)
        if child_budget < 300:
            break
        env = dict(os.environ, BENCH_REEXEC="1", BENCH_BUDGET_S=str(child_budget))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=child_budget + 60,
            )
        except subprocess.TimeoutExpired:
            continue
        sys.stderr.write(proc.stderr[-4000:])
        lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
        if not lines:
            continue
        try:
            rec = json.loads(lines[-1])
        except ValueError:
            continue
        if rec.get("value", 0) > 0 or "error" not in rec:
            for ln in lines:  # keep the driver's parse-the-last-line contract
                print(ln, flush=True)
            return True
    return False


def init_backend_with_retry(max_wait=600.0):
    """Backend init with bounded exponential backoff. The axon backend
    sometimes refuses to initialize under load (BENCH_r04: UNAVAILABLE at
    init) — a failed attempt leaves jax's backend table empty so a retry
    re-runs platform init. A HANGING init (dead tunnel) is detected by the
    bounded probe and aborts immediately: the record must still go out."""
    delay = 15.0
    t0 = time.perf_counter()
    attempt = 0
    while True:
        attempt += 1
        probe_budget = max(30.0, min(180.0, max_wait - (time.perf_counter() - t0)))
        try:
            devs = _devices_probe(probe_budget)
            log(f"backend up on attempt {attempt}: {devs[0]}")
            return devs
        except BenchTimeout:
            raise  # hang: unrecoverable in-process, emit the record now
        except Exception as e:  # noqa: BLE001
            waited = time.perf_counter() - t0
            if waited + delay > max_wait or remaining() < delay + 60:
                raise RuntimeError(
                    f"backend unavailable after {attempt} attempts / {waited:.0f}s: {e!r}"
                ) from e
            log(f"backend init attempt {attempt} failed ({e!r:.120}); retry in {delay:.0f}s")
            try:  # best-effort: drop any cached half-initialized backend state
                import jax
                import jax.extend.backend  # subpackage: not reachable via bare `import jax`

                jax.extend.backend.clear_backends()
            except Exception:  # noqa: BLE001
                pass
            time.sleep(delay)
            delay = min(delay * 2, 120.0)


def device_ms_from_trace(logdir):
    """Device busy time (ms) from the newest trace.json.gz under logdir.

    Device lanes are identified via process_name/thread_name metadata (TPU
    device pids); 'Steps' marker lanes AND 'XLA Modules' lanes are
    excluded. Busy time is the INTERVAL-UNION coverage of the op-level
    spans, not their flat duration sum: on this backend the 'XLA Ops' lane
    carries overlapping spans (pipelined scan steps execute concurrently —
    measured flat sum exactly 2x the union on a real tBL trace), so a flat
    sum double-counts. The modules lane is skipped because each module
    span covers the module's FULL execution window including device stalls
    (host waits, infeed) — exactly the load noise this instrument exists
    to exclude; on a quiet-day trace the ops-lane union equals the modules
    lane to 0.1 ms, but on a loaded day only the ops union stays honest.
    Returns None if no device lane was found.
    """
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                procs[e["pid"]] = (e.get("args") or {}).get("name", "")
            elif e.get("name") == "thread_name":
                threads[(e["pid"], e.get("tid"))] = (e.get("args") or {}).get("name", "")
    dev_pids = {
        pid for pid, name in procs.items()
        if ("TPU" in name or "/device:" in name) and "Host" not in name
    }
    spans = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = threads.get((e["pid"], e.get("tid")), "").lower()
        # 'Steps' markers span the window; 'XLA Modules' spans include
        # intra-module stalls. Only op-level lanes measure busy time.
        if "step" in tname or "module" in tname:
            continue
        ts = e.get("ts")
        if ts is not None:
            spans.append((ts, ts + e.get("dur", 0)))
    if not spans:
        return None
    spans.sort()
    cov, cur_s, cur_e = 0.0, spans[0][0], spans[0][1]
    for s, t in spans[1:]:
        if s <= cur_e:
            cur_e = max(cur_e, t)
        else:
            cov += cur_e - cur_s
            cur_s, cur_e = s, t
    cov += cur_e - cur_s
    return cov / 1e3


def trace_one(fn, prefix):
    """Run fn() under a jax.profiler trace in a fresh tempdir (a fixed dir
    could hold a stale trace from a previous run) and return its device
    busy ms, or None if no device lane was found. Cleans the trace dump up
    afterwards — an XLA trace is multi-MB and bench may trace several legs."""
    import shutil

    import jax

    logdir = tempfile.mkdtemp(prefix=prefix)
    try:
        with jax.profiler.trace(logdir):
            fn()
        return device_ms_from_trace(logdir)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def build_workload():
    """Ground-truth object + probe + scan geometry; measurements simulated
    on-device from the known object (demo/scripts/run_synthetic_demo.py at
    production scale)."""
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.models import forward, make_model
    from ptyrad_tpu.physics import make_mixed_probe, make_stem_probe, near_field_evolution
    from ptyrad_tpu.physics.constants import electron_wavelength

    rng = np.random.default_rng(0)
    kv, conv, dx, dz = 80.0, 24.9, 0.1494, 2.0
    lam = electron_wavelength(kv)

    probe = make_stem_probe({"kv": kv, "conv_angle": conv, "Npix": NPIX, "dx": dx})
    probe = make_mixed_probe(probe, PMODE, [0.02])

    canvas = SCAN_SIDE * STEP_PX + NPIX + 8
    ys, xs = np.meshgrid(np.arange(SCAN_SIDE) * STEP_PX, np.arange(SCAN_SIDE) * STEP_PX, indexing="ij")
    crop_pos = np.stack([ys.ravel() + 4, xs.ravel() + 4], -1).astype(np.int32)

    yy, xx = np.mgrid[0:canvas, 0:canvas].astype(np.float32)
    phase = np.zeros((NZ, canvas, canvas), np.float32)
    for z in range(NZ):
        for _ in range(300):
            cy, cx = rng.integers(12, canvas - 12, 2)
            phase[z] += 0.15 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
    true_obj = np.exp(1j * phase)[None].astype(np.complex64)

    init = {
        "obj": true_obj,
        "probe": probe,
        "probe_pos_shifts": np.zeros((N_SCANS, 2), np.float32),
        "obj_tilts": np.zeros((1, 2), np.float32),
        "slice_thickness": dz,
        "H": near_field_evolution((NPIX, NPIX), dx, dz, lam),
        "measurements": np.zeros((1, NPIX, NPIX), np.float32),  # placeholder
        "crop_pos": crop_pos,
        "omode_occu": np.ones(1, np.float32),
        "dx": dx,
        "lambd": lam,
        "N_scan_slow": SCAN_SIDE,
        "N_scan_fast": SCAN_SIDE,
    }
    params, buffers, geom = make_model(init)

    # simulate ON DEVICE and keep the store there (make_model passes a jax
    # array through untouched): the old host round-trip moved 2 GB through
    # the tunnel, which costs minutes under backend load. One jitted
    # lax.map over chunk rows = one program, no eager ops, no concat.
    # chunk 512: b=2048 pushes the patch-gather kernel's scalar prefetch
    # past the 1 MB SMEM space (measured: exceeded by 144 B)
    chunk = min(512, N_SCANS)

    @jax.jit
    def sim_all(p):
        idx = jnp.arange(N_SCANS, dtype=jnp.int32).reshape(-1, chunk)
        dps = jax.lax.map(lambda i: forward(p, buffers, geom, i)[0], idx)
        dps = dps.reshape(N_SCANS, NPIX, NPIX)
        return dps, jnp.sum(dps[-1])

    t0 = time.perf_counter()
    meas, check = sim_all(params)
    float(check)  # forced execution barrier
    log(f"simulated {N_SCANS} DPs from ground truth in {time.perf_counter()-t0:.1f}s")

    init["measurements"] = meas
    init["obj"] = np.ones_like(true_obj)  # reconstruct from flat
    return init, phase, canvas


def bench_pso(deadline_s):
    """Second reference demo workload (PSO / PrScO3, demo/params/
    PSO_reconstruct.yml:17-34): 4,096 DPs at 256x256 (on-the-fly padded from
    120^2 crops in the reference; simulated natively at 256^2 here), 4 probe
    modes, 21 slices at dz = 10 A, batch 32, plus the demo's 7 active
    per-iteration constraints (PSO_reconstruct.yml:151-162 — note the demo
    runs obj_zblur and leaves kz_filter at freq null/off). Runs through the
    same fused train_epoch; the multislice executes in the segmented Pallas
    chain (ops/pallas_chain.py).

    The ground truth is columnar (one set of atomic columns, smooth z
    profile — PrScO3 is columnar along the beam). Beyond timing, the leg
    continues to PSO_QUALITY_ITERS iterations and reports the phase
    correlation with ground truth over the scanned window, so the 21-slice
    chain-kernel regime has a recorded reconstruction-quality gate, not just
    throughput. Stops early (keeping partial results) once `deadline_s` of
    global elapsed time is reached. Returns (patterns/s, ms/step, losses,
    phase_corr, iters_done, trace_fields) where trace_fields carries the
    trace-derived pso_device_ms_per_step / pso_device_patterns_per_sec
    (empty when the trace leg was skipped or failed)."""
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.constraints import ConstraintScheduler
    from ptyrad_tpu.engine.solver import build_train_epoch
    from ptyrad_tpu.models import forward, make_model
    from ptyrad_tpu.optim import create_optimizer
    from ptyrad_tpu.physics import make_mixed_probe, make_stem_probe, near_field_evolution
    from ptyrad_tpu.physics.constants import electron_wavelength

    n_scans, npix, pmode, nz, batch, grid, step_px = (
        (64, 64, 2, 3, 8, 8, 3) if SMOKE else (4096, 256, 4, 21, 32, 64, 3))
    kv, conv, dx, dz = 300.0, 25.0, 0.4, 10.0
    lam = electron_wavelength(kv)
    rng = np.random.default_rng(1)

    probe = make_stem_probe({"kv": kv, "conv_angle": conv, "Npix": npix, "dx": dx})
    probe = make_mixed_probe(probe, pmode, [0.02])
    canvas = grid * step_px + npix + 8
    ys, xs = np.meshgrid(np.arange(grid) * step_px, np.arange(grid) * step_px, indexing="ij")
    crop_pos = np.stack([ys.ravel() + 4, xs.ravel() + 4], -1).astype(np.int32)
    # crystal-like ground truth: one set of atomic columns shared by ALL
    # slices with a smooth per-slice occupancy profile (PrScO3 is columnar
    # along the beam) — z-uncorrelated slices would conflict with the demo's
    # kz_filter constraint and turn the loss curve into a workload artifact
    yy, xx = np.mgrid[0:canvas, 0:canvas].astype(np.float32)
    cols = np.zeros((canvas, canvas), np.float32)
    for _ in range(150):
        cy, cx = rng.integers(12, canvas - 12, 2)
        cols += 0.1 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
    zprof = (0.8 + 0.2 * np.cos(np.linspace(0, np.pi, nz))).astype(np.float32)
    phase = zprof[:, None, None] * cols[None]
    true_obj = np.exp(1j * phase)[None].astype(np.complex64)

    init = {
        "obj": true_obj, "probe": probe,
        "probe_pos_shifts": np.zeros((n_scans, 2), np.float32),
        "obj_tilts": np.zeros((1, 2), np.float32), "slice_thickness": dz,
        "H": near_field_evolution((npix, npix), dx, dz, lam),
        "measurements": np.zeros((1, npix, npix), np.float32),
        "crop_pos": crop_pos, "omode_occu": np.ones(1, np.float32),
        "dx": dx, "lambd": lam, "N_scan_slow": grid, "N_scan_fast": grid,
    }
    params, buffers, geom = make_model(init)

    @jax.jit
    def sim_all(p):
        idx = jnp.arange(n_scans, dtype=jnp.int32).reshape(-1, min(256, n_scans))
        dps = jax.lax.map(lambda i: forward(p, buffers, geom, i)[0], idx)
        dps = dps.reshape(n_scans, npix, npix)
        return dps, jnp.sum(dps[-1])

    t0 = time.perf_counter()
    meas, check = sim_all(params)  # stays on device (see tBL note)
    float(check)
    log(f"PSO: simulated {n_scans} DPs in {time.perf_counter()-t0:.1f}s")

    init["measurements"] = meas
    init["obj"] = np.ones_like(true_obj)
    upd = {"obja": {"lr": 5e-4, "start_iter": 1}, "objp": {"lr": 5e-4, "start_iter": 1},
           "probe": {"lr": 1e-4, "start_iter": 1}}
    params, buffers, geom = make_model(init, {"update_params": upd})
    optimizer, opt_state, _, start = create_optimizer({"name": "Adam"}, upd, params)
    train_epoch = build_train_epoch(buffers, geom, LOSS_PARAMS, optimizer, start)
    # the demo's ACTIVE per-iteration constraints (PSO_reconstruct.yml:151-162;
    # kz_filter ships with freq null there — the demo regularizes z with
    # obj_zblur instead)
    constraint_fn = ConstraintScheduler({
        "ortho_pmode": {"freq": 1},
        "fix_probe_int": {"freq": 1},
        "obj_rblur": {"freq": 1, "obj_type": "both", "kernel_size": 5, "std": 0.4},
        "obj_zblur": {"freq": 1, "obj_type": "both", "kernel_size": 5, "std": 1.0},
        "mirrored_amp": {"freq": 1, "relax": 0.1, "scale": 0.03, "power": 4.0},
        "obja_thresh": {"freq": 1, "relax": 0.0, "thresh": (0.96, 1.04)},
        "objp_postiv": {"freq": 1, "relax": 0.0},
    }, geom)
    n_batches = n_scans // batch
    idx_all = jnp.asarray(
        np.random.default_rng(0).permutation(n_scans).reshape(n_batches, batch), jnp.int32)
    mask_all = jnp.ones(idx_all.shape, jnp.float32)

    def one_iter(params, opt_state, niter):
        params, opt_state, total, _ = train_epoch(
            params, opt_state, idx_all, mask_all, jnp.asarray(niter, jnp.int32))
        params = constraint_fn(params, buffers, niter)
        np.asarray(params.slice_thickness)  # forced execution barrier (see tBL note)
        return params, opt_state, float(total)

    t0 = time.perf_counter()
    params, opt_state, total = one_iter(params, opt_state, 1)
    log(f"PSO: compile+first iteration in {time.perf_counter()-t0:.1f}s (loss={total:.4f})")
    best = float("inf")
    losses = [float(total)]
    niter = 2
    for niter in range(2, 5):
        t0 = time.perf_counter()
        params, opt_state, total = one_iter(params, opt_state, niter)
        best = min(best, time.perf_counter() - t0)
        losses.append(float(total))
        log(f"PSO iter {niter}: {time.perf_counter()-t0:.2f}s loss={total:.4f}")
        if elapsed() > deadline_s:
            log("PSO: deadline during timing loop — keeping partial result")
            break
    # device-time trace of one epoch (same instrument as the tBL trace leg)
    # so tunnel load noise cannot erase the PSO perf record either
    pso_dev = {}
    if elapsed() < deadline_s - 60:
        try:
            t0 = time.perf_counter()
            traced = {}

            def traced_iter():
                traced["out"] = one_iter(params, opt_state, niter + 1)

            dev_ms = trace_one(traced_iter, "bench_pso_trace_")
            params, opt_state, total = traced["out"]
            niter += 1
            losses.append(float(total))
            if dev_ms is not None:
                pso_dev = {
                    "pso_device_ms_per_step": round(dev_ms / n_batches, 2),
                    "pso_device_patterns_per_sec": round(
                        batch * n_batches * 1e3 / dev_ms, 1),
                }
                log(f"PSO trace leg in {time.perf_counter()-t0:.1f}s: device "
                    f"{dev_ms:.0f} ms/epoch = {dev_ms / n_batches:.2f} ms/step")
        except Exception as e:  # noqa: BLE001 — a failed trace must not kill the leg
            log(f"PSO trace leg failed: {e!r:.200}")

    while niter < PSO_QUALITY_ITERS and elapsed() < deadline_s:
        niter += 1
        params, opt_state, total = one_iter(params, opt_state, niter)
        losses.append(float(total))
    log(f"PSO loss curve ({niter} iters): {' '.join(f'{v:.4f}' for v in losses)}")

    # reconstruction quality over the scanned window (same readout as the
    # tBL leg): z-summed reconstructed phase vs z-summed ground truth
    rec = np.asarray(params.objp).sum(axis=(0, 1))
    tru = phase.sum(0)
    lo = 4 + npix // 2
    hi = lo + (grid - 1) * step_px
    corr = float(np.corrcoef(rec[lo:hi, lo:hi].ravel(), tru[lo:hi, lo:hi].ravel())[0, 1])
    log(f"PSO phase corr after {niter} iters: {corr:.3f}")
    return n_scans / best, best / n_batches * 1e3, losses, corr, niter, pso_dev


def run_tbl(result):
    """Primary leg. Fills `result` in place so partial progress survives a
    watchdog abort; returns (params_final, true_phase, one_iter, state) for
    the trace leg."""
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.constraints import ConstraintScheduler
    from ptyrad_tpu.engine.solver import build_train_epoch
    from ptyrad_tpu.models import make_model
    from ptyrad_tpu.optim import create_optimizer

    # first device work happens inside build_workload (simulation); retry
    # once — transient transfer failures under load look like random
    # RuntimeErrors from the tunnel
    t0 = time.perf_counter()
    try:
        init, true_phase, canvas = build_workload()
    except BenchTimeout:
        raise
    except Exception as e:  # noqa: BLE001
        log(f"build_workload failed ({e!r:.160}); retrying once in 30s")
        time.sleep(30)
        init, true_phase, canvas = build_workload()
    log(f"workload built in {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    # model_params must reach make_model so geometry enables the probe-shift
    # path (shift_probes) — the demo config optimizes probe_pos_shifts
    params, buffers, geom = make_model(init, {"update_params": UPDATE_PARAMS})
    jax.block_until_ready(buffers.measurements)
    log(f"model+transfer ({buffers.measurements.nbytes/1e6:.0f} MB) in {time.perf_counter()-t0:.1f}s")

    optimizer, opt_state, _, start = create_optimizer({"name": "Adam"}, UPDATE_PARAMS, params)
    train_epoch = build_train_epoch(buffers, geom, LOSS_PARAMS, optimizer, start)
    constraint_fn = ConstraintScheduler(CONSTRAINT_PARAMS, geom)

    n_batches = N_SCANS // BATCH  # 512: the FULL production epoch
    rng = np.random.default_rng(0)
    idx_all = jnp.asarray(rng.permutation(N_SCANS).reshape(n_batches, BATCH), jnp.int32)
    mask_all = jnp.ones(idx_all.shape, jnp.float32)
    jax.block_until_ready(idx_all)

    def one_iter(params, opt_state, niter):
        params, opt_state, total, _ = train_epoch(
            params, opt_state, idx_all, mask_all, jnp.asarray(niter, jnp.int32)
        )
        params = constraint_fn(params, buffers, niter)
        # forced device->host fetches: on this backend block_until_ready
        # returns at enqueue; fetching an output leaf of each program is the
        # only reliable execution barrier (slice_thickness is a scalar leaf
        # of the constraint composite's output tree)
        np.asarray(params.slice_thickness)
        return params, opt_state, float(total)

    t0 = time.perf_counter()
    params, opt_state, total = one_iter(params, opt_state, 1)
    log(f"compile+first iteration in {time.perf_counter()-t0:.1f}s (loss={total:.4f})")

    # keep >=300 s for quality+PSO; stop the timing loop early if the
    # backend is crawling — 2 timed iters still give a best-of number
    best = float("inf")
    niter = 2
    for k in range(TIMED_ITERS):
        t0 = time.perf_counter()
        params, opt_state, total = one_iter(params, opt_state, niter)
        best = min(best, time.perf_counter() - t0)
        niter += 1
        log(f"iter {niter-1}: {time.perf_counter()-t0:.2f}s loss={total:.4f}")
        if k >= 1 and remaining() < 300:
            log("timing loop cut short by budget")
            break

    dps = N_SCANS / best
    result.update({
        "value": round(dps, 1),
        "vs_baseline": round(dps / REFERENCE_DPS_PER_SEC, 2),
        "sec_per_iter_16384dps": round(best, 2),
        "ms_per_step": round(best / n_batches * 1e3, 2),
        "final_loss": round(float(total), 4),
        "loss_finite": bool(np.isfinite(float(total))),
    })

    while niter <= QUALITY_ITERS and remaining() > 120:
        params, opt_state, total = one_iter(params, opt_state, niter)
        niter += 1

    # reconstruction quality vs ground truth over the scanned window
    rec = np.asarray(params.objp).sum(axis=(0, 1))
    tru = true_phase.sum(0)
    lo = 4 + NPIX // 2
    hi = lo + (SCAN_SIDE - 1) * STEP_PX
    corr = float(np.corrcoef(rec[lo:hi, lo:hi].ravel(), tru[lo:hi, lo:hi].ravel())[0, 1])
    result.update({
        "phase_corr": round(corr, 3),
        "quality_iters_done": niter - 1,
        "final_loss": round(float(total), 4),
        "loss_finite": bool(np.isfinite(float(total))),
    })
    if niter - 1 >= QUALITY_ITERS:
        # historical key (BENCH_r01..r04 comparisons) — only when the
        # quality loop actually reached 10 iterations
        result["phase_corr_after_10_iters"] = round(corr, 3)
    return params, opt_state, one_iter, init


def run_bf16_leg(result, init):
    """Time a few epochs under the bf16 compute policy
    (model_params.compute_dtype, the reference's autocast equivalent) —
    records the policy's measured speedup field (VERDICT r4 item 2)."""
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.constraints import ConstraintScheduler
    from ptyrad_tpu.engine.solver import build_train_epoch
    from ptyrad_tpu.models import make_model
    from ptyrad_tpu.optim import create_optimizer
    from ptyrad_tpu.ops.fourier import set_matmul_dtype

    set_matmul_dtype("bfloat16", silent=True)  # leg builds fresh closures
    try:
        mp = {"update_params": UPDATE_PARAMS, "compute_dtype": "bfloat16"}
        params, buffers, geom = make_model(init, mp)
        optimizer, opt_state, _, start = create_optimizer(
            {"name": "Adam"}, UPDATE_PARAMS, params)
        train_epoch = build_train_epoch(buffers, geom, LOSS_PARAMS, optimizer, start)
        constraint_fn = ConstraintScheduler(CONSTRAINT_PARAMS, geom)
        n_batches = N_SCANS // BATCH
        idx_all = jnp.asarray(
            np.random.default_rng(0).permutation(N_SCANS).reshape(n_batches, BATCH),
            jnp.int32)
        mask_all = jnp.ones(idx_all.shape, jnp.float32)

        best = float("inf")
        total = None
        for niter in range(1, 5):
            t0 = time.perf_counter()
            params, opt_state, total, _ = train_epoch(
                params, opt_state, idx_all, mask_all, jnp.asarray(niter, jnp.int32))
            params = constraint_fn(params, buffers, niter)
            np.asarray(params.slice_thickness)  # execution barrier
            dt = time.perf_counter() - t0
            if niter > 1:  # skip the compile iteration
                best = min(best, dt)
            log(f"bf16 iter {niter}: {dt:.2f}s loss={float(total):.4f}")
            if remaining() < 120:
                break
        if np.isfinite(best):
            result["bf16_patterns_per_sec"] = round(N_SCANS / best, 1)
            if result.get("value"):
                result["bf16_speedup_vs_f32"] = round(
                    (N_SCANS / best) / result["value"], 3)
        result["bf16_loss_finite"] = bool(total is not None and np.isfinite(float(total)))
    finally:
        set_matmul_dtype("float32", silent=True)


def run_trace_leg(result, params, opt_state, one_iter):
    """Trace one full epoch+constraints iteration and record device-lane
    time per step — the load-noise-immune number (VERDICT r4 item 1c)."""
    t0 = time.perf_counter()
    dev_ms = trace_one(
        lambda: one_iter(params, opt_state, QUALITY_ITERS + 1), "bench_trace_")
    if dev_ms is None:
        log("trace leg: no device lane found in trace — skipping field")
        return
    n_batches = N_SCANS // BATCH
    result["device_ms_per_step"] = round(dev_ms / n_batches, 3)
    result["device_sec_per_iter"] = round(dev_ms / 1e3, 2)
    result["device_patterns_per_sec"] = round(N_SCANS / (dev_ms / 1e3), 1)
    log(f"trace leg in {time.perf_counter()-t0:.1f}s: device {dev_ms:.0f} ms/epoch "
        f"= {dev_ms/n_batches:.3f} ms/step")


def main():
    signal.signal(signal.SIGALRM, _alarm_handler)
    signal.alarm(max(60, int(BUDGET_S)))

    result = {
        "metric": "tBL_WSe2 training throughput (fwd+bwd+update, full epoch + constraints)",
        "value": 0.0,
        "unit": "patterns/sec/chip",
        "vs_baseline": 0.0,
        "baseline_basis": "364 DPs/s = 16384/45s-iter, reference CHANGELOG.md:310 "
                          "(unspecified GPU; the repo publishes no benchmark table "
                          "- see BASELINE.md)",
        "batch_size": BATCH,
        "config": "16384 DPs 128x128, 6 pmode, 6 slices, Adam, loss_single+loss_sparse, "
                  "7 constraints (demo tBL_WSe2_reconstruct.yml), 512-batch epoch",
    }

    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        if SMOKE:
            jax.config.update("jax_platforms", "cpu")
            result["smoke"] = True
        try:
            devs = init_backend_with_retry(max_wait=min(600.0, BUDGET_S * 0.4))
        except BenchTimeout as e:
            # hang: unrecoverable in THIS process — try fresh ones while
            # the budget allows, then fall back to the error record
            result["error"] = str(e)
            log(f"WATCHDOG: {e}")
            if _fresh_process_retry():
                signal.alarm(0)
                sys.exit(0)
            raise
        result["device"] = str(devs[0])

        # canary: a chip can accept backend init and then hang on the first
        # real work; prove one tiny compile+fetch round-trip inside a bounded
        # probe before committing the main thread to unbounded device calls.
        # Generous bound: first remote compiles are a latency lottery
        # (8 s - 5 min on this tunnel).
        def canary():
            import jax.numpy as jnp

            return float(jnp.sum(jnp.asarray(np.ones(8, np.float32))))

        _bounded(canary, max(60.0, min(480.0, remaining() - 120.0)),
                 "first device op")
        log("canary device op ok")

        tbl_params, tbl_opt, tbl_iter, tbl_init = run_tbl(result)
        emit(result)  # primary leg is now on the record whatever happens next

        if remaining() > 150:
            try:
                run_trace_leg(result, tbl_params, tbl_opt, tbl_iter)
                emit(result)
            except BenchTimeout:
                raise
            except Exception as e:  # noqa: BLE001
                log(f"trace leg failed: {e!r:.200}")

        # secondary workload: the reference's PSO demo (21 slices, 256^2)
        # through the segmented/mega chain kernel; a failure there must not
        # cost the primary metric
        if remaining() > 420:
            try:
                (pso_dps, pso_ms, pso_losses, pso_corr, pso_iters,
                 pso_dev) = bench_pso(deadline_s=BUDGET_S - 60)
                result.update(pso_dev)
                result.update({
                    "pso_patterns_per_sec": round(pso_dps, 1),
                    "pso_ms_per_step": round(pso_ms, 1),
                    # r2 ran PSO on the XLA fallback at ~390 DPs/s (docs/performance.md)
                    "pso_vs_r2_xla_path": round(pso_dps / 390.0, 2),
                    "pso_phase_corr": round(pso_corr, 3),
                    "pso_quality_iters_done": pso_iters,
                    "pso_loss_first_last": [round(pso_losses[0], 4), round(pso_losses[-1], 4)],
                    "pso_loss_monotone_dec": bool(
                        all(b <= a + 1e-4 for a, b in zip(pso_losses, pso_losses[1:]))
                    ),
                })
            except BenchTimeout:
                raise
            except Exception as e:  # noqa: BLE001
                log(f"PSO bench failed: {e!r}")
                result["pso_error"] = repr(e)[:200]
        else:
            result["pso_skipped"] = f"budget: {remaining():.0f}s left"

        if remaining() > 300:
            emit(result)
            try:
                run_bf16_leg(result, tbl_init)
            except BenchTimeout:
                raise
            except Exception as e:  # noqa: BLE001
                log(f"bf16 leg failed: {e!r:.200}")
                result["bf16_error"] = repr(e)[:200]
        else:
            result["bf16_skipped"] = f"budget: {remaining():.0f}s left"
    except BenchTimeout as e:
        result["error"] = str(e)
        log(f"WATCHDOG: {e}")
    except Exception as e:  # noqa: BLE001
        result["error"] = repr(e)[:400]
        log(f"FATAL (still emitting record): {e!r}")

    signal.alarm(0)
    if not result.get("value"):
        try:
            _attach_last_good(result)
        except Exception as e:  # noqa: BLE001 — never let the fallback kill the record
            log(f"last-good lookup failed: {e!r:.120}")
    emit(result)
    sys.exit(0)


if __name__ == "__main__":
    main()
