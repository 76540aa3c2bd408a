#!/usr/bin/env python
"""Benchmark: particle-updates/sec/chip on the lcdm_gas-style TreePM+SPH
workload (BASELINE.md north-star metric; reference instrument:
[G2: timings.txt part/sec, gravtree.c — the part/sec line always prints]).

Prints ONE JSON line to stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Robustness contract (round-4, after BENCH_r03 timed out rc=124 with a
sick remote-compile path): this process ALWAYS prints the JSON line,
bounded by a deadline, even if the TPU backend hangs or the persistent
compile cache is corrupt. Structure:

  parent (this file, no jax device use)
    ├─ attempt 1: child `bench.py` BENCH_INNER=1 at 128³  (timeout T1)
    ├─ attempt 2: child at 64³                            (timeout T2)
    └─ if both fail: print {"value": 0.0, ... "error": ...}

Children print heartbeats to stderr so a hang is visible in the captured
tail; the parent kills a child whose attempt timeout expires (device
init and XLA compile cannot be interrupted in-process, so subprocess
isolation is the only reliable watchdog).

Env knobs: BENCH_DEADLINE_S (default 1500), BENCH_NSIDE, BENCH_STEPS,
BENCH_PMGRID.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE = 1e7  # north-star target [BASELINE.md]
METRIC = "particle_updates_per_sec_per_chip_lcdm_gas"


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


# --------------------------------------------------------------------------
# inner measurement (runs in a child process; may hang — parent kills it)
# --------------------------------------------------------------------------

def inner_main():
    n_side = int(os.environ.get("BENCH_NSIDE", "128"))
    n_steps = int(os.environ.get("BENCH_STEPS", "6"))
    _log(f"inner start: n_side={n_side} steps={n_steps} pid={os.getpid()}")

    # heartbeat thread: proves liveness in the captured tail during the
    # (minutes-long) device init / compile phases
    import threading
    phase = {"name": "import"}

    def _beat():
        t0 = time.time()
        while True:
            time.sleep(20)
            _log(f"heartbeat t={time.time() - t0:.0f}s phase={phase['name']}")

    threading.Thread(target=_beat, daemon=True).start()

    import jax

    # Persistent compilation cache: the 128³ step costs ~10-20 min of
    # remote compile cold; cached executables bring repeats to seconds.
    # BENCH_r03 died to cache-entry read errors from a sick backend —
    # the cache stays enabled (it is the only way to fit the deadline)
    # but everything after this point is bounded by the parent's timeout.
    cache_dir = os.path.join(REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimisation, never fatal
        _log(f"cache config failed (continuing uncached): {e}")

    phase["name"] = "device-init"
    dev = jax.devices()[0]
    _log(f"device: {dev}")

    import jax.numpy as jnp

    from gadget_leicester_tpu.core.config import (SimOptions, auto_pmgrid,
                                                  parse_parameter_text)
    from gadget_leicester_tpu.models.ics import lcdm_gas_ics
    from gadget_leicester_tpu.models.simulation import Simulation

    box = 50000.0
    param = f"""
InitCondFile x
OutputDir  /tmp/bench_out
TimeBegin  0.090909
TimeMax    1.0
ComovingIntegrationOn 1
PeriodicBoundariesOn 1
BoxSize    {box}
Omega0     0.3
OmegaLambda 0.7
OmegaBaryon 0.04
HubbleParam 0.7
ErrTolIntAccuracy 0.025
MaxSizeTimestep 0.025
CourantFac 0.15
DesNumNgb 33
MaxNumNgbDeviation 2
ArtBulkViscConst 0.8
InitGasTemp 1000
MinGasTemp 5
SofteningGas  {box / n_side / 30:.3f}
SofteningHalo {box / n_side / 30:.3f}
SofteningGasMaxPhys  {box / n_side / 30:.3f}
SofteningHaloMaxPhys {box / n_side / 30:.3f}
MinGasHsmlFractional 0.1
"""
    cfg = parse_parameter_text(param)
    # pmgrid ~ 1.55*n_side puts the short-range cell occupancy near 100
    # for two species with cap-128 tiles (ncells = floor(pmgrid/5.625))
    pmgrid = int(os.environ.get("BENCH_PMGRID", "0")) or auto_pmgrid(
        2 * n_side**3)
    opts = SimOptions(periodic=True, pmgrid=pmgrid, gravity_mode="treepm",
                      sph_backend="auto")  # auto -> block-packed on TPU
    sim = Simulation(cfg, opts)

    phase["name"] = "ics"
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)
    t0 = time.time()
    sim.set_ics(pos, vel, mass, ptype, u=u)
    jax.block_until_ready(sim.state.p.pos)
    init_s = time.time() - t0

    from gadget_leicester_tpu.core import timeline
    from gadget_leicester_tpu.models.simulation import sync_point_step

    @jax.jit
    def count_active(st):
        ti_next = timeline.min_active_ti_end(st.p.ti_endstep, st.p.alive)
        return jnp.sum(timeline.active_mask(st.p.ti_endstep, ti_next,
                                            st.p.alive))

    phase["name"] = "compile"
    t0 = time.time()
    st = sync_point_step(sim.state, sim.cfg, sim.opts)
    upd0 = count_active(st)
    upd0 = upd0 + upd0  # compile the accumulate-add too
    # NB: jax.block_until_ready does NOT synchronise on the axon platform;
    # a scalar readback is the only reliable fence.
    _ = float(st.p.pos[0, 0]) + int(upd0)
    compile_s = time.time() - t0
    _log(f"compile done in {compile_s:.0f}s")

    phase["name"] = "measure"
    # No device->host transfer inside the loop (a scalar readback over the
    # axon tunnel costs seconds); accumulate the count on device, read once.
    total = None
    t0 = time.time()
    for _ in range(n_steps):
        c = count_active(st)
        total = c if total is None else total + c
        st = sync_point_step(st, sim.cfg, sim.opts)
    _ = float(st.p.pos[0, 0])  # readback fence (see above)
    elapsed = time.time() - t0
    updates = int(total)

    ups = updates / elapsed
    print(json.dumps({
        "metric": METRIC,
        "value": round(ups, 1),
        "unit": "updates/s",
        "vs_baseline": round(ups / BASELINE, 4),
        "detail": {
            "n_particles": int(2 * n_side**3),
            "n_side": n_side,
            "steps": n_steps,
            "elapsed_s": round(elapsed, 3),
            "compile_s": round(compile_s, 2),
            "init_s": round(init_s, 2),
            "device": str(dev),
            "overflow_flags": int(st.overflow_flags),
            "pmgrid": pmgrid,
        },
    }), flush=True)


# --------------------------------------------------------------------------
# parent: attempt ladder with hard timeouts — ALWAYS prints one JSON line
# --------------------------------------------------------------------------

def _run_attempt(n_side, timeout_s, extra_env=None):
    """Run one child measurement; return parsed JSON dict or None."""
    env = dict(os.environ)
    env["BENCH_INNER"] = "1"
    env["BENCH_NSIDE"] = str(n_side)
    env.update(extra_env or {})
    _log(f"attempt n_side={n_side} timeout={timeout_s:.0f}s")
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=sys.stderr, env=env,
            start_new_session=True)  # own pgid: killable incl. grandchildren
    except Exception as e:
        _log(f"spawn failed: {e}")
        return None
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        _log(f"attempt n_side={n_side} TIMED OUT after {timeout_s:.0f}s; "
             "killing child process group")
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except Exception:
            proc.kill()
        proc.wait()
        return None
    if proc.returncode != 0:
        _log(f"attempt n_side={n_side} exited rc={proc.returncode}")
    for line in (out or b"").decode(errors="replace").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                if d.get("metric") == METRIC:
                    return d
            except Exception:
                pass
    return None


def main():
    if os.environ.get("BENCH_INNER"):
        inner_main()
        return

    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
    t_start = time.time()

    def remaining():
        return deadline_s - (time.time() - t_start)

    n_side = int(os.environ.get("BENCH_NSIDE", "128"))

    # Attempt 1: the stock config. Leave ≥240s for the fallback attempt.
    t1 = max(60.0, remaining() - 240.0)
    result = _run_attempt(n_side, t1)
    attempt = f"{n_side}^3"

    # Attempt 2: reduced scale — a number at 64³ beats no number
    # [G2: gravtree.c part/sec always prints].
    if result is None and n_side != 64 and remaining() > 60:
        result = _run_attempt(64, max(60.0, remaining() - 15.0))
        attempt = "64^3-fallback"

    if result is None:
        result = {
            "metric": METRIC,
            "value": 0.0,
            "unit": "updates/s",
            "vs_baseline": 0.0,
            "detail": {
                "error": "all measurement attempts failed or timed out "
                         "(TPU backend unavailable?)",
                "deadline_s": deadline_s,
                "elapsed_s": round(time.time() - t_start, 1),
            },
        }
        attempt = "failed"
    result.setdefault("detail", {})["attempt"] = attempt
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
