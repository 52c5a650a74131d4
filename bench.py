"""Benchmark: end-to-end IC generation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpart/sec", "vs_baseline": N}

The headline number is END-TO-END: fused Hermitian mode synthesis from the
pcg64 stream + unnormalized inverse 3-D FFT + device->host fetch + particle
serialization to ic_* files -- the same walltime the reference's final
"Mpart/sec" print covers (src/zeldovich.cpp:1022-1029), minus one-time
setup/compile (the analog of its cached FFTW planning).  The compute-only
rate (synthesis+iFFT) is also reported as an extra key.

One guard: this build environment reaches its TPU through a remote tunnel
whose device->host fetch path runs orders of magnitude below a real
PCIe-attached host.  The bench probes fetch bandwidth first; if fetching
the grid would blow BENCH_E2E_BUDGET (default 900 s), it reports the
compute-only metric and says so in the metric name -- measured numbers
only, never extrapolations.

Baseline: the reference publishes no wall-clock numbers (BASELINE.md); the
project north star is 4096^3 in < 5 min on a v4-64 slice, i.e.
4096^3 / 300 s / 64 chips = 3.58 Mpart/sec/chip.  vs_baseline is measured
per-chip throughput divided by that target rate, so 1.0 == on target.

The measurement runs in a subprocess with a timeout; if the accelerator
runtime is unreachable (e.g. a wedged device tunnel), it falls back to the
CPU backend rather than hanging, and labels the metric accordingly.

Timing: per-step device time comes from an in-jit lax.fori_loop chain
(one dispatch covers K steps; the remote tunnel's per-dispatch overhead
cancels in the chain(K)-chain(1) delta).  Every artifact is stamped with
the kernel route (fft_algo), matmul precision (fft_precision), and which
fallback-ladder attempt produced it (bench_attempt).

Regression gate: the default-route TPU run compares its compute rate
against the best prior BENCH_*.json artifact (incl. the committed
BENCH_FLOOR.json) for the same (ppd, dtype); >10% below best stamps
regressed_vs_best=true and, under BENCH_REGRESSION_FAIL=1 (set by the
scripts/run_r* wrappers), exits 2.

Env knobs: BENCH_PPD (default 512), BENCH_DTYPE (float32|float64|df64,
default float32 -- the TPU fast path), BENCH_REPS (default 6),
BENCH_TRIALS (chain-delta repeats, default 3), BENCH_TIMEOUT (seconds
per attempt, default 1500), BENCH_E2E (0 disables the output stage),
BENCH_E2E_BUDGET (seconds), BENCH_OUTDIR (default /dev/shm).
"""

import json
import os
import subprocess
import sys
import time


def child():
    ppd = int(os.environ.get("BENCH_PPD", "512"))
    if os.environ.get("BENCH_FALLBACK") == "cpu":
        # the CPU fallback exists to report SOMETHING when the device
        # tunnel is wedged; 512^3 on host cores blows the attempt timeout,
        # so it drops to a grid the CPU finishes in minutes
        ppd = min(ppd, int(os.environ.get("BENCH_CPU_PPD", "256")))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    reps = int(os.environ.get("BENCH_REPS", "6"))

    import jax

    jax.config.update("jax_enable_x64", True)  # u64 RNG limbs
    from zeldovich_tpu.utils.backend import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from pathlib import Path

    from zeldovich_tpu.models.pipeline import Zeldovich
    from zeldovich_tpu.utils.params import Parameters

    assets = Path(__file__).parent / "zeldovich_tpu" / "assets"
    cfg_dict = dict(
        BoxSize=720.0,
        NP=ppd**3,
        CPD=ppd,
        ICFormat="RVZel",
        InitialConditionsDirectory="/tmp/bench_ic",
        InitialRedshift=49.0,
        ZD_Seed=12346,
        ZD_NumBlock=2,
        ZD_Pk_scale=1.0,
        ZD_Pk_norm=8.0,
        ZD_Pk_sigma=0.0210839935761,
        ZD_Pk_smooth=0.0,
        ZD_Pk_filename=str(assets / "wmap1new.pow"),
        ZD_Version=2,
    )
    if os.environ.get("BENCH_PLT") == "1":
        # the reference's flagship configuration (example.par: ZD_qPLT=1):
        # narray=4, eigenmode projection + velocity arrays
        cfg_dict.update(
            ZD_qPLT=1,
            ZD_PLT_filename=str(assets / "eigmodes128"),
            ZD_qPLT_rescale=1,
            ZD_PLT_target_z=5.0,
        )
    param = Parameters.from_dict(cfg_dict)
    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
    model = Zeldovich(param, dtype=dtype)

    # complex-free half-spectrum path: real-pair synthesis on ky in
    # [0, half] + matmul (MXU) FFT with a c2r y-transform -- works on every
    # backend and is the TPU-native formulation (never materializes the
    # Hermitian mirror half).  The static amplitude field (pk_eff) is setup
    # work, passed by argument so it is not baked in as a constant.
    # BENCH_DTYPE=df64 measures the mixed parity mode (f32 draw chain +
    # f64-grade int8-MXU transforms, <1e-6 displacement parity).
    step = (
        model.xspace_half_df64 if dtype_name == "df64" else model.xspace_half_pair
    )

    import numpy as np
    from jax import lax

    # The measured function, parameterized on pk_eff so the timing chain
    # below can thread a data dependency through it.
    # coefs ride as ARGUMENTS everywhere (None unless BENCH_PLT): closing
    # over the ~1 GB coefficient planes would embed them as compiled-in
    # constants
    if dtype_name == "df64":
        from zeldovich_tpu.models.pipeline import _half_df64_forward

        fwd = lambda pk, coefs: _half_df64_forward(model.cfg, model.tables, pk)
        coefs0 = None
    else:
        from zeldovich_tpu.models.pipeline import _half_pair_forward

        fwd = lambda pk, coefs: _half_pair_forward(
            model.cfg, model.tables, pk, dtype, coefs
        )
        coefs0 = model.plt_coefs  # None unless BENCH_PLT
    pk0 = model.pk_eff

    # Client-side Mosaic lowering gate: kernel block-legality is checked
    # on the client in seconds, BEFORE burning a slow remote compile.  A
    # route that cannot lower fails this attempt and the ladder retries
    # with the kernels off -- stamped as such -- so an unlowerable kernel
    # can never silently produce an unattributed number.  (Lowering does
    # not validate VMEM fit; the kernels budget that at trace time.)
    spec = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
    jax.jit(fwd).lower(spec(pk0), jax.tree.map(spec, coefs0))

    # Timing: an in-jit chain.  Host-dispatched step loops measure the
    # remote tunnel's per-dispatch overhead as much as the device (the
    # same 512^3 step measured 58 ms and 184 ms on the same chip within
    # 30 minutes with the host-loop method).  A lax.fori_loop carrying a
    # scalar data dependency (out[0...0] perturbs the next pk_eff by
    # ~1e-30, far below f32 resolution) runs K steps in ONE dispatch --
    # no loop-invariant hoisting is possible, every step executes on
    # device, and the dispatch + scalar-fetch cost cancels exactly in the
    # (chain(K) - chain(1)) / (K - 1) delta.
    eps = jnp.asarray(1e-30, pk0.dtype)

    @jax.jit
    def chain(pk_eff, coefs, k):
        def body(i, carry):
            out = fwd(pk_eff + carry * eps, coefs)
            return out[(0,) * out.ndim].astype(pk_eff.dtype)

        return lax.fori_loop(0, k, body, jnp.zeros((), pk_eff.dtype))

    chain_ = lambda k: chain(pk0, coefs0, k)
    probe = np.asarray(chain_(1))  # compile + warm-up
    assert np.all(np.isfinite(probe)), "non-finite output"
    run_e2e = os.environ.get("BENCH_E2E", "1") != "0"
    if run_e2e:
        # the plain (non-chain) step is a second remote compile: only pay
        # for it when the e2e stage will actually use it
        out_probe = step()
        assert np.all(
            np.isfinite(np.asarray(out_probe[0, 0, :2, :2, :2]))
        ), "fetch failed"

    K = max(reps, 2) + 1
    trials = []
    for _ in range(int(os.environ.get("BENCH_TRIALS", "3"))):
        t0 = time.perf_counter()
        np.asarray(chain_(1))
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chain_(K))
        t_k = time.perf_counter() - t0
        trials.append(max((t_k - t_one) / (K - 1), 1e-9))
    dt = min(trials)

    result = {
        "ppd": ppd,
        "dtype": dtype_name,
        "seconds": dt,
        "seconds_trials": [round(t, 4) for t in trials],
        "timing": f"fori-chain-{K}",
        "mpart_per_sec": param.np / 1e6 / dt,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "bench_attempt": os.environ.get("BENCH_ATTEMPT", "default"),
        **_route(ppd, dtype_name),
    }
    if dtype_name == "float32" and jax.devices()[0].platform == "tpu":
        # the roofline denominators are accelerator chip peaks; they mean
        # nothing for the CPU-fallback measurement
        result.update(_roofline(ppd, param.narray, dt))

    # ---- end-to-end: + device->host fetch + particle serialization ----
    if os.environ.get("BENCH_E2E", "1") != "0":
        e2e = _end_to_end(param, step, ppd)
        if e2e is not None:
            result.update(e2e)
    print(json.dumps(result))


def _route(ppd, dtype_name):
    """Which kernel route the step dispatches to -- stamped into the
    artifact so every recorded number is attributable (round-3 lesson:
    three mutually inconsistent measurements with no route recorded)."""
    import jax.numpy as jnp

    from zeldovich_tpu.ops.mmfft import _resolve_precision, precision_name

    prec = precision_name()
    _resolve_precision(None)  # validate the knob early
    if dtype_name == "df64":
        return {"fft_algo": "ozaki-int8-df64", "fft_precision": "df64"}
    from zeldovich_tpu.ops.modes_real import mega_route_on
    from zeldovich_tpu.ops.pallas_fft import (
        use_c2r_pallas,
        use_zx_folded,
        use_zx_tiled,
    )

    qplt = os.environ.get("BENCH_PLT") == "1"
    if use_zx_folded(jnp.float32, ppd):
        zx = "mega" if mega_route_on(jnp.float32, ppd, qplt) else "pallas-folded"
    elif use_zx_tiled(jnp.float32, ppd):
        zx = "pallas-tiled"
    else:
        zx = "xla-matmul"
    c2r = "pallas-c2r" if use_c2r_pallas(jnp.float32, ppd) else "xla-c2r"
    algo = f"{zx}+{c2r}" + ("+plt" if qplt else "")
    if os.environ.get("ZT_NO_PALLAS_PACK"):
        algo += "+xla-pack"  # synthesis/packing forced off the kernel
    return {"fft_algo": algo, "fft_precision": prec}


def _roofline(ppd, narray, dt):
    """Analytic flops/bytes model of the half-spectrum step vs chip peaks.

    Gives the throughput claim a denominator (what fraction of the chip
    the step actually uses) instead of only a ratio to the project target.

    Model (G = (ppd/2+1) * ppd^2 half-spectrum modes; narray complex
    arrays carried as 2 pm-packings each -> F = 2*narray complex fields),
    per the route the step actually takes:
      XLA z/x transforms: dense Karatsuba matmul DFT = 3 real
        (rows x N)@(N x N) matmuls per field per axis = 3*G*N MACs; the
        folded Pallas kernels (ops/pallas_fft, TPU) do 1*G*N per axis;
      c2r y transform: 4 real [N x (h+1)] matmuls per array = 4*G*N MACs
        unfolded; 2*G*N for the folded Pallas form.
      HBM: synthesis writes the 2*narray pm-packed complex fields as
        4*narray real planes of (h+1, N, N) = 16*narray*G bytes; each
        XLA transform reads+writes them (32*narray*G per axis) where the
        fused Pallas zx kernel does both axes in one pass (32*narray*G
        total) and the mega route fuses the synthesis write into that
        same pass; c2r reads 16*narray*G and writes the FULL mirrored
        y extent -- narray*2*N^3 reals = 8*narray*N^3 bytes (~2x the
        half-spectrum read; round-4's model undercounted this as another
        16*narray*G, hiding that the measured c2r was already at ~90% of
        the bandwidth roofline).
    MACs count as 2 flops.  Matmul operand re-streaming and XLA fusion
    wins are not modeled: this is an analytic estimate, stated as such.

    Peaks default to TPU v5e (197 bf16 Tflop/s, 819 GB/s HBM); "f32" MXU
    matmuls are multi-pass bf16, so the f32 roofline is peak_bf16 divided
    by the pass count of the active ZT_FFT_PRECISION (highest=6, high=3,
    default=1).  Override with BENCH_PEAK_BF16_TFLOPS / BENCH_HBM_GBS.
    """
    import jax.numpy as jnp

    from zeldovich_tpu.ops.modes_real import mega_route_on
    from zeldovich_tpu.ops.pallas_fft import use_c2r_pallas, use_zx_folded

    G = (ppd // 2 + 1) * ppd * ppd
    fields = 2 * narray
    zx_folded = use_zx_folded(jnp.float32, ppd)
    c2r_folded = use_c2r_pallas(jnp.float32, ppd)
    qplt = os.environ.get("BENCH_PLT") == "1"
    mega = mega_route_on(jnp.float32, ppd, qplt)
    zx_macs = (1 if zx_folded else 3) * 2 * fields  # 2 axes
    c2r_macs = (2 if c2r_folded else 4) * narray
    flops = (zx_macs + c2r_macs) * G * ppd * 2.0
    spm = 8 * fields * G  # the pm-packed half-spectrum, bytes
    pk_in = 4 * G
    if mega:  # synthesis + both in-plane DFTs fused: ONE spm write
        synth_zx = pk_in + spm
    elif zx_folded:  # synth writes spm; fused zx reads + rewrites it
        synth_zx = pk_in + spm + 2 * spm
    else:  # XLA matmul transforms: read+write per axis
        synth_zx = pk_in + spm + 4 * spm
    # c2r reads the half-spectrum, writes the FULL mirrored y extent
    c2r_bytes = spm + 8 * narray * ppd**3
    hbm_bytes = synth_zx + c2r_bytes
    peak_bf16 = float(os.environ.get("BENCH_PEAK_BF16_TFLOPS", "197")) * 1e12
    from zeldovich_tpu.ops.mmfft import precision_name

    passes = {"highest": 6, "high": 3, "default": 1}[precision_name()]
    peak_f32 = peak_bf16 / passes
    peak_hbm = float(os.environ.get("BENCH_HBM_GBS", "819")) * 1e9
    return {
        "model_tflops": round(flops / dt / 1e12, 2),
        "mxu_util_pct": round(100.0 * flops / dt / peak_f32, 1),
        "model_hbm_gbs": round(hbm_bytes / dt / 1e9, 1),
        "hbm_util_pct": round(100.0 * hbm_bytes / dt / peak_hbm, 1),
    }


def _end_to_end(param, step, ppd):
    """Measured full-run rate incl. output, or None if infeasible here."""
    import shutil

    import numpy as np

    from zeldovich_tpu.utils.output import OutputWriter, setup_output_dir
    from zeldovich_tpu.utils.streamio import _dslice, stream_xspace

    budget = float(os.environ.get("BENCH_E2E_BUDGET", "900"))

    x = step()  # already compiled/warm
    grid_bytes = x.size * x.dtype.itemsize
    # fetch-bandwidth probe: one small chunk through the real path
    # (warm-up first so the slice compile doesn't pollute the estimate)
    nprobe = 1  # one z-plane: small enough to survive a KB/s tunnel
    np.asarray(_dslice(x, 0, nprobe, -2))
    t0 = time.perf_counter()
    h = np.asarray(_dslice(x, nprobe, nprobe, -2))
    bw = h.nbytes / max(time.perf_counter() - t0, 1e-9)
    eta = grid_bytes / bw
    if eta > budget:
        print(
            f"# e2e skipped: fetch bandwidth {bw / 1e6:.2f} MB/s would need "
            f"{eta:.0f} s for {grid_bytes / 1e9:.1f} GB (> {budget:.0f} s "
            "budget); this is the remote tunnel, not the device",
            file=sys.stderr,
        )
        return None

    outdir = os.environ.get("BENCH_OUTDIR")
    if outdir is None:
        outdir = "/dev/shm/zt_bench" if os.path.isdir("/dev/shm") else "/tmp/zt_bench"
    out_bytes = param.np * 32  # RVZel records
    usage = shutil.disk_usage(os.path.dirname(outdir) or "/")
    if usage.free < out_bytes * 1.25:
        outdir = "/tmp/zt_bench"
        if shutil.disk_usage("/tmp").free < out_bytes * 1.25:
            print("# e2e skipped: not enough scratch space", file=sys.stderr)
            return None
    param.output_dir = outdir  # absolute; output_path resolves from this

    setup_output_dir(param)
    writer = OutputWriter(param)
    t0 = time.perf_counter()
    x2 = step()
    stream_xspace(x2, writer, pair=True)
    dt = time.perf_counter() - t0
    shutil.rmtree(outdir, ignore_errors=True)
    return {
        "e2e_seconds": dt,
        "e2e_mpart_per_sec": param.np / 1e6 / dt,
        "e2e_out_gb": writer.bytes_written / 1e9,
        "fetch_mb_per_sec": bw / 1e6,
    }


def _best_prior(ppd, dtype_name, here=None):
    """Best prior recorded compute rate for this config, for the
    regression gate: scans the committed BENCH_r*.json driver artifacts
    plus BENCH_FLOOR.json (a hand-committed floor for numbers that were
    measured in runs/ logs but never became a driver artifact).

    Round-4 lesson: a commit 7 minutes before the snapshot regressed the
    512^3 step 37.6 -> 45.9 ms and nothing flagged it, because every
    bench run was a point measurement with no memory.  Returns
    (rate, source) or (None, None).
    """
    import glob
    import re

    best, src = None, None
    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_*.json"))):
        try:
            with open(path) as f:
                cand = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if cand.get("unit") not in (None, "Mpart/sec"):
            continue
        m = re.search(r"\((\d+)\^3, (\w+)", cand.get("metric", ""))
        if m:
            if int(m.group(1)) != ppd or m.group(2) != dtype_name:
                continue
        elif not (cand.get("ppd") == ppd and cand.get("dtype") == dtype_name):
            continue  # BENCH_FLOOR.json carries explicit ppd/dtype keys
        rate = cand.get("compute_mpart_per_sec", cand.get("value"))
        if isinstance(rate, (int, float)) and rate > 0:
            if best is None or rate > best:
                best, src = float(rate), os.path.basename(path)
    return best, src


def main():
    timeout = int(os.environ.get("BENCH_TIMEOUT", "1500"))
    attempts = [dict(os.environ, BENCH_ATTEMPT="default")]
    # fallback 1: same device, Pallas kernels off (the pure-XLA matmul
    # route) -- isolates a kernel-compile failure from a device outage
    xla_env = dict(os.environ)
    xla_env.update(
        ZT_NO_PALLAS_FFT="1", ZT_NO_PALLAS="1", BENCH_ATTEMPT="xla-fallback"
    )
    attempts.append(xla_env)
    # fallback 2: CPU backend (skip any accelerator plugin registration)
    cpu_env = dict(os.environ)
    cpu_env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        BENCH_FALLBACK="cpu",
        BENCH_ATTEMPT="cpu-fallback",
    )
    attempts.append(cpu_env)

    result = None
    device_timed_out = False
    for env in attempts:
        if device_timed_out and "BENCH_FALLBACK" not in env:
            # a timeout means the device is unreachable, not that the
            # program failed: retrying another route on the same device
            # would only burn another full timeout
            continue
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child"],
                env=env,
                capture_output=True,
                text=True,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            print(
                f"# bench attempt timed out after {timeout}s "
                f"(platform env JAX_PLATFORMS={env.get('JAX_PLATFORMS')})",
                file=sys.stderr,
            )
            device_timed_out = True
            continue
        for line in proc.stdout.splitlines():
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "mpart_per_sec" in cand:
                result = cand
                break
        if result:
            break
        print(proc.stderr[-2000:], file=sys.stderr)

    if not result:
        print(
            json.dumps(
                {
                    "metric": "IC generation throughput (device unreachable)",
                    "value": 0.0,
                    "unit": "Mpart/sec",
                    "vs_baseline": 0.0,
                }
            )
        )
        return 1

    target_per_chip = 4096**3 / 300.0 / 64 / 1e6  # 3.58 Mpart/sec/chip
    compute_mps = result["mpart_per_sec"]
    # Headline policy: the end-to-end rate IS the metric when the
    # device->host path is host-attached grade (>= 1 GB/s).  Through the
    # remote build tunnel (tens of MB/s, ~2-3 orders below a PCIe host)
    # the e2e wall-clock measures the tunnel, not the framework, so the
    # compute rate headlines and the measured e2e appears in extra keys.
    fetch_bw = result.get("fetch_mb_per_sec", 0.0)
    if "e2e_mpart_per_sec" in result and fetch_bw >= 1000.0:
        mps = result["e2e_mpart_per_sec"]
        stage = "end-to-end incl. output"
        extra = {
            "compute_mpart_per_sec": round(compute_mps, 3),
            "output_gb": round(result["e2e_out_gb"], 3),
        }
    elif "e2e_mpart_per_sec" in result:
        mps = compute_mps
        stage = (
            "synthesis+iFFT; e2e measured but remote-tunnel fetch-bound, "
            "see extra keys"
        )
        extra = {
            "e2e_mpart_per_sec": round(result["e2e_mpart_per_sec"], 3),
            "e2e_output_gb": round(result["e2e_out_gb"], 3),
            "fetch_mb_per_sec": round(fetch_bw, 1),
        }
    else:
        mps = compute_mps
        stage = "synthesis+iFFT; output skipped: tunnel fetch-bound"
        extra = {}
    # roofline denominator + route attribution: every recorded number says
    # which kernel route, matmul precision, and ladder attempt produced it
    for k in (
        "fft_algo",
        "fft_precision",
        "bench_attempt",
        "timing",
        "seconds_trials",
        "model_tflops",
        "mxu_util_pct",
        "model_hbm_gbs",
        "hbm_util_pct",
    ):
        if k in result:
            extra[k] = result[k]
    # ---- scaling curve: merge the committed measured sweep (if any) ----
    # scripts/scaling_curve.py measures 256/512 (non-PLT and PLT, in-core
    # chain timing) + 1024 (slab-step) and writes runs/scaling_r5.json;
    # merging it here puts the whole curve in every driver artifact with
    # provenance, without re-burning ~30 min of remote compiles per bench.
    try:
        sc_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "runs", "scaling_r5.json",
        )
        with open(sc_path) as f:
            sc = json.load(f)
        extra["scaling"] = sc["points"]
        extra["scaling_note"] = sc.get("note", "")
    except (OSError, json.JSONDecodeError, KeyError):
        pass

    # ---- regression gate: compare against the best prior artifact ----
    # Only for the default route on the real device: the xla/cpu fallback
    # ladders and opt-in knob runs measure something else by design.
    regressed = False
    if (
        result.get("bench_attempt") == "default"
        and result["platform"] == "tpu"
        # PLT runs measure a different config (narray 4); comparing them
        # against non-PLT priors of the same ppd would false-flag
        and os.environ.get("BENCH_PLT") != "1"
    ):
        best, src = _best_prior(result["ppd"], result["dtype"])
        if best:
            ratio = compute_mps / best
            extra["best_prior_mpart_per_sec"] = round(best, 1)
            extra["best_prior_source"] = src
            extra["regressed_vs_best"] = ratio < 0.90
            regressed = ratio < 0.90
            if regressed:
                print(
                    f"# PERF REGRESSION: {compute_mps:.0f} Mpart/s is "
                    f"{100 * (1 - ratio):.0f}% below the best prior "
                    f"{best:.0f} ({src})",
                    file=sys.stderr,
                )
    print(
        json.dumps(
            {
                "metric": (
                    f"IC generation throughput ({result['ppd']}^3, "
                    f"{result['dtype']}, {stage}, {result['platform']})"
                ),
                "value": round(mps, 3),
                "unit": "Mpart/sec",
                "vs_baseline": round(mps / target_per_chip, 3),
                **extra,
            }
        )
    )
    print(
        f"# compute step: {result['ppd']}^3 in {result['seconds']:.3f} s on "
        f"{result['device']}"
        + (
            f"; e2e {result['e2e_seconds']:.3f} s "
            f"({result['e2e_out_gb']:.2f} GB written, fetch "
            f"{result['fetch_mb_per_sec']:.0f} MB/s)"
            if "e2e_seconds" in result
            else ""
        ),
        file=sys.stderr,
    )
    if regressed and os.environ.get("BENCH_REGRESSION_FAIL", "0") != "0":
        # opt-in hard failure for the scripts/run_r* wrappers; the driver
        # invocation still records the (flagged) artifact
        return 2
    return 0


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        sys.exit(main())
