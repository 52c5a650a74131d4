"""Step-time scaling curve: 256^3 / 512^3 / 1024^3, non-PLT and PLT.

VERDICT r4 #6: round-4 tuning optimized a single point (512^3 non-PLT).
This records the in-jit step time at every size the chip can hold
in-core (256, 512; both flavors) plus the 1024^3 slab-step rate through
the out-of-core kernels (the in-core half-spectrum at 1024^3 is ~17 GB
of planes -- beyond the 16 GB chip), into runs/scaling_r5.json.
bench.py merges that artifact into its output as `scaling` extras so the
driver-recorded BENCH_r*.json carries the whole curve.

In-core points run through bench.py itself (same chain timing, same
route stamping).  Usage (detached on the TPU):
  setsid nohup python scripts/scaling_curve.py > runs/scaling_r5.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root))

out = {"recorded_unix": None, "points": []}


def bench_point(ppd, plt):
    env = dict(
        os.environ,
        BENCH_PPD=str(ppd),
        BENCH_E2E="0",
        BENCH_TRIALS="3",
    )
    if plt:
        env["BENCH_PLT"] = "1"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(root / "bench.py")],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    for line in proc.stdout.splitlines():
        try:
            cand = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "value" in cand:
            pt = {
                "ppd": ppd,
                "plt": bool(plt),
                "mode": "in-core",
                "mpart_per_sec": cand["value"],
                "step_ms": round(1e3 * ppd**3 / 1e6 / cand["value"], 1)
                if cand["value"] else None,
                "fft_algo": cand.get("fft_algo"),
                "bench_attempt": cand.get("bench_attempt"),
            }
            print(json.dumps(pt), flush=True)
            return pt
    print(f"# bench {ppd} plt={plt} FAILED ({time.time()-t0:.0f}s):\n"
          f"{proc.stderr[-1500:]}", flush=True)
    return None


def slab_point_1024(plt):
    """1024^3 via the out-of-core slab kernels: measure one y-slab
    synth+zx pass and one z-slab y-transform, scale by slab count (the
    full grid is exactly ny such passes; stated as slab-step, not e2e)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    from zeldovich_tpu.utils.backend import enable_compilation_cache

    enable_compilation_cache()
    from functools import partial

    import jax.numpy as jnp
    import numpy as np

    from zeldovich_tpu.models.outofcore import _ifft_y_pair, _synth_ifft_zx_pair
    from zeldovich_tpu.models.pipeline import Zeldovich
    from zeldovich_tpu.utils.params import Parameters

    PPD = int(os.environ.get("SCAL_BIG_PPD", "1024"))
    NY = int(os.environ.get("SCAL_NY", "8"))
    assets = root / "zeldovich_tpu" / "assets"
    d = dict(
        BoxSize=720.0, NP=PPD**3, CPD=PPD, ICFormat="RVZel",
        InitialConditionsDirectory="/tmp/scal_ooc", InitialRedshift=49.0,
        ZD_Seed=12346, ZD_NumBlock=2, ZD_Pk_scale=1.0, ZD_Pk_norm=8.0,
        ZD_Pk_sigma=0.0210839935761, ZD_Pk_smooth=0.0,
        ZD_Pk_filename=str(assets / "wmap1new.pow"), ZD_Version=2,
    )
    if plt:
        d.update(ZD_qPLT=1, ZD_PLT_filename=str(assets / "eigmodes128"),
                 ZD_qPLT_rescale=1, ZD_PLT_target_z=5.0)
    param = Parameters.from_dict(d)
    model = Zeldovich(param, dtype=jnp.float32)
    cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff
    half = PPD // 2
    ys = half // NY  # generated-half rows per y-slab

    from jax import lax

    def time_chain(chain):
        """bench.py's in-jit K-vs-1 chain delta.  Everything eager is
        wrong through the axon tunnel: block_until_ready returns at
        dispatch (first cut recorded 0.8 ms), and every separate jit
        invocation re-marshals its table arguments (second cut recorded
        a ~16 s/call upload tax).  A lax.fori_loop over the slab call
        inside ONE jit pays dispatch + fetch once, and the
        (chain(K)-chain(1))/(K-1) delta cancels them."""
        np.asarray(chain(1))  # compile + warm-up
        np.asarray(chain(K := 4))

        def run(k):
            t0 = time.perf_counter()
            np.asarray(chain(k))
            return time.perf_counter() - t0

        t1 = min(run(1) for _ in range(2))
        tk = min(run(K) for _ in range(2))
        return max(tk - t1, 0.0) / (K - 1)

    @partial(jax.jit, static_argnames=("k",))
    def zx_chain(tables, k):
        def body(i, acc):
            # y0 = i: each iteration synthesizes a DIFFERENT slab, so
            # XLA can neither hoist nor CSE the loop body
            r = _synth_ifft_zx_pair(i, ys, cfg, tables, jnp.float32)
            return acc + r[(0,) * r.ndim]

        return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    t_zx = time_chain(lambda k: zx_chain(tables, k))
    slab = _synth_ifft_zx_pair(0, ys, cfg, tables, jnp.float32)
    zs = PPD // NY
    zslab = jnp.zeros(slab.shape[:-3] + (PPD, zs, PPD), jnp.float32)

    @partial(jax.jit, static_argnames=("k",))
    def y_chain(zslab, k):
        def body(i, acc):
            # carry-dependent corner write chains the iterations; costs
            # one buffer pass per step (small vs the transform itself)
            z = zslab.at[(0,) * zslab.ndim].add(acc * jnp.float32(1e-30))
            r = _ifft_y_pair(z)
            return acc + r[(0,) * r.ndim]

        return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    t_y = time_chain(lambda k: y_chain(zslab, k))
    narray = 4 if plt else 2
    # full-volume slab-step time: NY y-slabs (incl. mirrors folded in the
    # half-spectrum form) + NY z-slabs
    step_ms = 1e3 * (t_zx * (half // ys) + t_y * (PPD // zs))
    pt = {
        "ppd": PPD, "plt": bool(plt), "mode": f"slab-step x{NY}",
        "slab_zx_ms": round(t_zx * 1e3, 1), "slab_y_ms": round(t_y * 1e3, 1),
        "step_ms": round(step_ms, 1),
        "mpart_per_sec": round(PPD**3 / 1e6 / (step_ms / 1e3), 1),
    }
    print(json.dumps(pt), flush=True)
    return pt


points = []
sizes = [(256, 0), (256, 1), (512, 0), (512, 1)]
do_slab = True
if os.environ.get("SCAL_SMALL"):
    sizes = [(int(os.environ["SCAL_SMALL"]), 0)]
    do_slab = False
if os.environ.get("SCAL_ONLY"):
    # rerun a subset and merge over the existing artifact, e.g.
    # SCAL_ONLY=512:1,slab  (ppd:plt in-core points; "slab" = the 1024
    # out-of-core slab-step point)
    want = os.environ["SCAL_ONLY"].split(",")
    sizes = [tuple(int(v) for v in w.split(":")) for w in want
             if w != "slab"]
    do_slab = "slab" in want
for ppd, plt in sizes:
    pt = bench_point(ppd, plt)
    if pt:
        points.append(pt)
if do_slab:
    try:
        pt = slab_point_1024(0)
        if pt:
            points.append(pt)
    except Exception as e:
        print(f"# 1024 slab point FAILED: {type(e).__name__}: {e}",
              flush=True)

if os.environ.get("SCAL_ONLY"):
    # keep prior points not re-measured this run
    try:
        with open(root / "runs" / "scaling_r5.json") as f:
            prior = json.load(f)["points"]
        key = lambda p: (p["ppd"], p["plt"], p["mode"])
        fresh = {key(p) for p in points}
        points = [p for p in prior if key(p) not in fresh] + points
        points.sort(key=lambda p: (p["ppd"], p["plt"]))
    except (OSError, json.JSONDecodeError, KeyError):
        pass

out = {"recorded_unix": time.time(), "points": points,
       "note": "in-core points via bench.py chain timing; 1024 is the "
               "out-of-core slab-step rate (per-slab measured, x slab "
               "count), not end-to-end"}
with open(root / "runs" / "scaling_r5.json", "w") as f:
    json.dump(out, f, indent=1)
print("WROTE runs/scaling_r5.json", flush=True)
