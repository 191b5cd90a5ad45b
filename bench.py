#!/usr/bin/env python
"""Round benchmark — prints ONE JSON line.

Measures the BASELINE.md tracked metric: images/sec/chip for the
DWT-featurize + embed path on the flagship VOC-study model
(4-band SWT on device → MultiDinoHashing vit-s/14 → 64-bit codes), plus the
VOC-sized full-matrix Hamming retrieval eval wall-clock.

``vs_baseline`` is measured against the same computation executed on one
CPU host (the reference implementation's platform — its pipeline was
CPU-side pywt + a single-GPU torch model; a CPU run of the identical JAX
program is the conservative stand-in available in this image).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Transient axon-backend init failures (observed: ``RuntimeError: Unable to
# initialize backend 'axon': UNAVAILABLE``) must be retried from a FRESH
# process — jax caches the failed backend for the life of the interpreter.
# The outer process re-execs this script with bounded backoff and, if every
# attempt fails, still emits one structured JSON line (rc=0) so the driver
# records the failure instead of an empty BENCH file.
_INNER_ENV = "IRW_BENCH_INNER"
_RETRY_DELAYS = (30, 60, 120)  # seconds between attempts (4 attempts total)
_TRANSIENT_MARKERS = ("UNAVAILABLE", "Unable to initialize backend",
                      "DEADLINE_EXCEEDED", "failed to connect")


def build_pipeline(backbone="dinov2_vits14", nbits=64, embed_dim=384, num_heads=8,
                   dtype="bfloat16", use_pallas=True, quant_int8=False,
                   vmem_attn=False, ln_fused=False):
    import jax
    import jax.numpy as jnp

    from irw_tpu.models import get_model
    from irw_tpu.ops.wavelets import swt2

    model = get_model(
        "multidino_attention_hashing_ortho",
        backbone=backbone,
        nbits=nbits,
        frozen_backbone=True,
        vit_kwargs={"dtype": dtype, "quant_int8": quant_int8,
                    "vmem_attn": vmem_attn, "ln_fused": ln_fused},
        fusion_config={
            "type": "cross_attention_advanced",
            "output_dim": embed_dim,
            "num_queries": 4,
            "num_heads": num_heads,
            "ortho_weight": 0.01,
        },
    )

    from irw_tpu.ops.wavelets.pallas_dwt import haar_swt2_pallas

    def pipeline(variables, images_u8):
        # device transform: /255 + stationary wavelet → 4-band stack
        x = images_u8.astype(jnp.float32) / 255.0
        img = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
        if use_pallas:
            b, c, h, w = img.shape
            flat = haar_swt2_pallas(img.reshape(b * c, h, w))
            stack = flat.reshape(b, c, 4, h, w).transpose(0, 2, 1, 3, 4)
        else:
            (ca, (lh, hl, hh)), = swt2(img, "haar", level=1)
            stack = jnp.stack([ca, lh, hl, hh], axis=1)
        bands = jnp.moveaxis(stack, 2, -1)
        codes, _ = model.apply(variables, bands, train=False)
        return codes

    return model, pipeline


def time_pipeline(device, batch, iters, variables, pipeline):
    import jax

    v = jax.device_put(variables, device)
    b = jax.device_put(batch, device)
    with jax.default_device(device):
        fn = jax.jit(pipeline)
        np.asarray(fn(v, b))  # compile + warmup (host fetch = hard sync)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(v, b)
        # block_until_ready alone does not reliably sync through the axon
        # tunnel — a host fetch of the (tiny) codes array does
        np.asarray(out)
        return (time.perf_counter() - t0) / iters


def main():
    import jax

    from irw_tpu.utils.chip_lock import acquire_chip_lock

    # wait at the lock BEFORE jax.default_backend() attaches the chip:
    # attaching while another process owns it poisons both (CLAUDE.md)
    acquire_chip_lock()

    # persistent compile cache: repeat bench runs skip the multi-minute
    # XLA compilation of the flagship graph.  TPU-only: XLA:CPU AOT entries
    # are keyed without host CPU features, and loading one written on a
    # previous host SIGILLs the process (CLAUDE.md; utils/misc) — under the
    # CPU harness the bench must run uncached.
    try:
        if jax.default_backend() != "cpu":
            jax.config.update("jax_compilation_cache_dir",
                              "/root/repo/.jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    batch_size = 64
    rng = np.random.RandomState(0)
    batch = rng.randint(0, 255, (batch_size, 224, 224, 3), dtype=np.uint8)

    model, pipeline = build_pipeline()
    init_rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "band_drop": jax.random.PRNGKey(2),
    }
    import jax.numpy as jnp

    sample_bands = jnp.zeros((1, 4, 224, 224, 3), jnp.float32)
    # jit the init: eager init dispatches thousands of tiny ops (very slow
    # over the axon tunnel)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        init_rngs, sample_bands
    )

    accel = jax.devices()[0]
    accel_time = time_pipeline(accel, batch, iters=10, variables=variables, pipeline=pipeline)
    tpu_ips = batch_size / accel_time

    # analytic MFU for the inference path (forward FLOPs / bf16 peak)
    from irw_tpu.utils.flops import device_peak_flops, flagship_forward_flops

    fwd_flops = flagship_forward_flops()
    peak, peak_label = device_peak_flops(accel)
    infer_mfu = fwd_flops * tpu_ips / peak

    # CPU reference of the identical program (conservative stand-in for the
    # torch/pywt reference pipeline) — small batch, per-image extrapolation,
    # ≥3 iterations so the denominator isn't a single noisy sample
    cpu = jax.devices("cpu")[0]
    cpu_batch = batch[:8]
    # CPU leg uses the jnp wavelet path (compiled pallas is TPU-only).
    # Persistent cache OFF for the CPU compile: XLA:CPU AOT entries are
    # keyed without host CPU features, and loading one cached on a
    # different machine aborts the process (utils/misc.enable_compile_cache)
    _, cpu_pipeline = build_pipeline(use_pallas=False)
    try:
        jax.config.update("jax_enable_compilation_cache", False)
        cpu_time = time_pipeline(cpu, cpu_batch, iters=3, variables=variables,
                                 pipeline=cpu_pipeline)
    finally:
        jax.config.update("jax_enable_compilation_cache", True)
    cpu_ips = cpu_batch.shape[0] / cpu_time

    # unfrozen flagship train step (the reference study's actual regime:
    # all 4 DINOv2 branches train — multidino_attention_hashing_ortho.yaml
    # frozen: False ×4), batch 96
    train_extras = {}
    try:
        import importlib.util as _ilu
        import os as _os

        spec = _ilu.spec_from_file_location(
            "irw_train_bench",
            _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                          "benchmarks", "train_bench.py"))
        tb = _ilu.module_from_spec(spec)
        spec.loader.exec_module(tb)
        # batch 48 + FULL block remat ("nothing") + the VMEM-resident fused
        # attention kernel (ops/vmem_attention.py) is the measured unfrozen
        # winner: 417 img/s / 31.1% MFU vs 364 stock at the b48 knee, and
        # 401 vs 279 at the reference's batch 96 — the kernel removes the
        # HBM-materialised (N,N) attention tensors the round-4 profiler
        # identified as the dominant traffic class.  Also the engine
        # default on TPU (models/factory.py).
        t_batch = 48
        step, t_state, t_batch_data, t_entries = tb.build(
            t_batch, frozen=False, remat_policy="nothing", vmem_attn=True)
        dt, _, _ = tb.measure(step, t_state, t_batch_data, t_entries, t_batch,
                              iters=5)
        train_ips = t_batch / dt
        train_extras = {
            "train_ips_unfrozen": round(train_ips, 1),
            "train_ms_per_step_unfrozen": round(dt * 1000, 1),
            "train_mfu_unfrozen": round(3.0 * fwd_flops * train_ips / peak, 4),
        }
        # continuity with the round-2/3/4 tables: the stock XLA-attention
        # full-remat step as a secondary measurement
        try:
            p_step, p_state, p_batch_d, p_entries = tb.build(
                t_batch, frozen=False, remat_policy="nothing")
            p_dt, _, _ = tb.measure(p_step, p_state, p_batch_d, p_entries,
                                    t_batch, iters=5)
            train_extras["train_ips_stock_attn"] = round(t_batch / p_dt, 1)
        except Exception as exc:
            train_extras["train_ips_stock_attn"] = None
            train_extras["train_stock_attn_error"] = repr(exc)[:160]
    except Exception as exc:  # keep the headline line robust
        train_extras = {"train_ips_unfrozen": None,
                        "train_bench_error": repr(exc)[:200]}

    # int8 serving path (ops/quant.py): same float param tree, qkv/out/mlp
    # matmuls on the MXU int8 path (2× bf16 peak on v5e); codes at init are
    # bit-identical to float (tests/test_quant.py), so this is a pure
    # throughput axis
    int8_extras = {}
    try:
        _, q_pipeline = build_pipeline(quant_int8=True)
        q_time = time_pipeline(accel, batch, iters=10, variables=variables,
                               pipeline=q_pipeline)
        int8_extras = {"infer_ips_int8": round(batch_size / q_time, 2)}
    except Exception as exc:
        int8_extras = {"infer_ips_int8": None,
                       "int8_bench_error": repr(exc)[:160]}

    # On-chip numeric parity of the VMEM attention kernel vs the stock XLA
    # attention (VERDICT r4 weak #3: the BASELINE.md maxdiff claim needed a
    # driver-verifiable artifact).  Flagship shape (bands·B=192, N=257,
    # H=6, hd=64, bf16), fwd + full (dq,dk,dv) grad maxdiff in f32.
    parity_extras = {}
    try:
        from irw_tpu.ops.vmem_attention import fused_attention

        p_rng = np.random.RandomState(1)
        p_shape = (192, 257, 6, 64)
        q, k, v = (jnp.asarray(p_rng.randn(*p_shape), jnp.bfloat16)
                   for _ in range(3))
        cot = jnp.asarray(p_rng.randn(*p_shape), jnp.bfloat16)

        def ref_attention(q, k, v):
            hd = q.shape[-1]
            s = jnp.einsum("...qhd,...khd->...hqk",
                           q / jnp.sqrt(hd).astype(q.dtype), k)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            return jnp.einsum("...hqk,...khd->...qhd", p, v)

        def loss_of(att):
            return lambda q, k, v: (att(q, k, v).astype(jnp.float32)
                                    * cot.astype(jnp.float32)).sum()

        fused_fwd = jax.jit(fused_attention)
        ref_fwd = jax.jit(ref_attention)
        o_fused = np.asarray(fused_fwd(q, k, v), np.float32)
        o_ref = np.asarray(ref_fwd(q, k, v), np.float32)
        fwd_diff = float(np.abs(o_fused - o_ref).max())
        g_fused = jax.jit(jax.grad(loss_of(fused_attention), argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.jit(jax.grad(loss_of(ref_attention), argnums=(0, 1, 2)))(q, k, v)
        grad_diff = max(
            float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())
            for a, b in zip(g_fused, g_ref))
        parity_extras = {"vmem_attn_parity": {
            "fwd_maxdiff": round(fwd_diff, 6),
            "grad_maxdiff": round(grad_diff, 6),
            "shape": list(p_shape), "dtype": "bfloat16",
        }}
    except Exception as exc:
        parity_extras = {"vmem_attn_parity": None,
                         "vmem_attn_parity_error": repr(exc)[:160]}

    # VOC-sized retrieval eval wall-clock (5717 × 5717 Hamming + metric suite)
    from irw_tpu.ops.metrics import compute_retrieval_metrics

    n = 5717
    codes = np.sign(rng.randn(n, 64)).astype(np.float32)
    labels = (rng.rand(n, 20) > 0.85).astype(np.float32)
    # warm once (compile / cache load), then time the steady state — the
    # number that matters across a 50-epoch run evaluating every 5 epochs
    compute_retrieval_metrics(
        codes, labels, codes, labels, metric="hamming", k=n, same_source=True,
        with_hashing_stats=True,
    )
    t0 = time.perf_counter()
    res = compute_retrieval_metrics(
        codes, labels, codes, labels, metric="hamming", k=n, same_source=True,
        with_hashing_stats=True,
    )
    eval_seconds = time.perf_counter() - t0

    # TPU↔CPU metric parity (the SURVEY §7 step-8 A/B harness): the same
    # retrieval eval on the CPU backend must agree to float tolerance
    small_codes = codes[:512]
    small_labels = labels[:512]
    res_small_tpu = compute_retrieval_metrics(
        small_codes, small_labels, small_codes, small_labels,
        metric="hamming", k=512, same_source=True,
    )
    try:
        jax.config.update("jax_enable_compilation_cache", False)  # CPU leg
        with jax.default_device(jax.devices("cpu")[0]):
            res_small_cpu = compute_retrieval_metrics(
                jax.device_put(small_codes, jax.devices("cpu")[0]),
                jax.device_put(small_labels, jax.devices("cpu")[0]),
                jax.device_put(small_codes, jax.devices("cpu")[0]),
                jax.device_put(small_labels, jax.devices("cpu")[0]),
                metric="hamming", k=512, same_source=True,
            )
    finally:
        jax.config.update("jax_enable_compilation_cache", True)
    parity_diff = abs(res_small_tpu["map"] - res_small_cpu["map"])

    print(json.dumps({
        "metric": "flagship_swt_embed_throughput",
        "value": round(tpu_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(tpu_ips / cpu_ips, 2),
        "extra": {
            "cpu_reference_ips": round(cpu_ips, 2),
            "mfu": round(infer_mfu, 4),
            "mfu_peak": peak_label,
            "voc_full_eval_seconds": round(eval_seconds, 3),
            "voc_eval_map": round(res["map"], 4),
            "tpu_cpu_map_parity_diff": round(float(parity_diff), 6),
            "backend": jax.default_backend(),
            **int8_extras,
            **train_extras,
            **parity_extras,
        },
    }))


def _run_with_retries() -> int:
    """Re-exec the benchmark in child processes with bounded backoff.

    Forwards the child's stdout verbatim on success.  On final failure
    prints a structured error JSON line and returns 0 — the driver then
    records the failure mode instead of an rc=1 with no JSON.
    """
    import subprocess

    env = dict(os.environ, **{_INNER_ENV: "1"})
    last_tail = ""
    attempts = len(_RETRY_DELAYS) + 1
    # a wedged axon tunnel HANGS rather than failing fast (observed round 4):
    # bound each attempt so the retry loop actually gets to retry
    attempt_timeout = int(os.environ.get("IRW_BENCH_ATTEMPT_TIMEOUT", "2700"))
    probe_timeout = int(os.environ.get("IRW_BENCH_PROBE_TIMEOUT", "300"))

    def _chip_answers() -> tuple[bool, str]:
        """Cheap liveness probe in a FRESH interpreter (a backend-init
        failure is cached for the life of a process).  Bounds the cost of
        a hung tunnel to ``probe_timeout`` per attempt instead of paying
        ``attempt_timeout`` (sized for a legitimate cold compile) on a
        chip that will never answer."""
        # another live process holding the advisory chip lock means the
        # chip is owned, not wedged: report alive without attaching (the
        # real attempt will wait politely at the same lock)
        try:
            import fcntl
            with open("/tmp/irw_chip.lock", "a") as lf:
                try:
                    fcntl.flock(lf, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    fcntl.flock(lf, fcntl.LOCK_UN)
                except OSError:
                    return True, ""
        except OSError:
            pass
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax, numpy as np, jax.numpy as jnp; "
                 "np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))"],
                capture_output=True, text=True, timeout=probe_timeout)
        except subprocess.TimeoutExpired:
            return False, f"liveness probe hung >{probe_timeout}s (wedged TPU tunnel?)"
        if p.returncode != 0:
            return False, (p.stderr or p.stdout or "")[-1200:]
        return True, ""

    for attempt in range(attempts):
        # the probe cannot distinguish a wedged tunnel from a chip merely
        # HELD by another process (a second process's first dispatch blocks
        # until the owner exits — CLAUDE.md), so it only short-circuits the
        # NON-final attempts: the last attempt always runs the real bench
        # with the full attempt_timeout, which waits out a busy chip
        if attempt < attempts - 1:
            alive, probe_tail = _chip_answers()
            if not alive:
                last_tail = probe_tail
                delay = _RETRY_DELAYS[attempt]
                print(f"bench attempt {attempt + 1}/{attempts}: backend "
                      f"probe failed; retrying in {delay}s", file=sys.stderr)
                time.sleep(delay)
                continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=attempt_timeout,
            )
        except subprocess.TimeoutExpired as exc:
            last_tail = (f"attempt timed out after {attempt_timeout}s "
                         f"(wedged TPU tunnel?): "
                         + ((exc.stderr or b"").decode("utf-8", "replace")
                            if isinstance(exc.stderr, bytes)
                            else (exc.stderr or ""))[-1200:])
            if attempt < attempts - 1:
                delay = _RETRY_DELAYS[attempt]
                print(f"bench attempt {attempt + 1}/{attempts} timed out; "
                      f"retrying in {delay}s", file=sys.stderr)
                time.sleep(delay)
            continue
        if proc.returncode == 0 and proc.stdout.strip():
            sys.stdout.write(proc.stdout)
            sys.stderr.write(proc.stderr[-2000:])
            return 0
        last_tail = (proc.stderr or proc.stdout or "")[-2000:]
        transient = any(m in last_tail for m in _TRANSIENT_MARKERS)
        if attempt < attempts - 1:
            delay = _RETRY_DELAYS[attempt] if transient else _RETRY_DELAYS[attempt] // 2
            print(f"bench attempt {attempt + 1}/{attempts} failed "
                  f"(transient={transient}); retrying in {delay}s",
                  file=sys.stderr)
            time.sleep(delay)
    print(json.dumps({
        "metric": "flagship_swt_embed_throughput",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": last_tail[-800:],
    }))
    return 0


if __name__ == "__main__":
    if os.environ.get(_INNER_ENV):
        main()
    else:
        sys.exit(_run_with_retries())
