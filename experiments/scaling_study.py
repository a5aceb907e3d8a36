"""Scaling-efficiency harness: data-parallel train throughput at 1..N devices.

SURVEY.md §7.1 bench/ row ("scaling-efficiency harness (1 chip / 1 host /
N hosts)") and the BASELINE.json north star (">=90% scaling efficiency at 2
hosts"). The reference has no distributed training at all (SURVEY §2.7); this
measures the framework's data-parallel path: params replicated, dataset and
batch sharded on the ``data`` mesh axis, gradients reduced by XLA-inserted
psum inside the fused ``train_chunk`` program.

Weak scaling: per-device batch and per-device dataset shard are fixed, so
perfect scaling is throughput(N) = N * throughput(1) (efficiency 1.0).

On a real pod this measures true ICI/DCN scaling (run one process per host via
``parallel.launch.initialize_distributed``). In a single-chip/CPU environment
it falls back to N virtual CPU devices — that validates the sharded program
and the harness end to end, but virtual devices share host cores, so the CPU
"efficiency" is a lower bound on the program's scalability, not a hardware
claim (the artifact records the platform so the two are never conflated).

Usage:
    python experiments/scaling_study.py                 # 1,2,4,8 virtual CPU
    python experiments/scaling_study.py --device-counts 1,2,4 --full-model
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup

_rt_setup()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def measure_device_count(
    d: int,
    *,
    cfg,
    tc,
    host_h: np.ndarray,
    per_device_batch: int,
    samples_per_device: int,
    steps_per_chunk: int,
    reps: int,
):
    """Weak-scaling throughput of the fused train chunk on a d-device mesh."""
    from channelestimationtransformer_tpu.models import build_informer
    from channelestimationtransformer_tpu.parallel.mesh import make_mesh
    from channelestimationtransformer_tpu.train.trainer import (
        create_train_state,
        train_chunk_dp,
    )

    mesh = make_mesh(data=d, devices=jax.devices()[:d])
    model = build_informer(cfg)
    state = create_train_state(
        model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc
    )
    state = jax.device_put(state, NamedSharding(mesh, P()))

    n = samples_per_device * d
    h = jax.device_put(
        jnp.asarray(host_h[:n]), NamedSharding(mesh, P("data"))
    )
    batch = per_device_batch * d

    kwargs = dict(
        mesh=mesh,
        num_steps=steps_per_chunk,
        per_device_batch=per_device_batch,
        label_len=cfg.label_len,
        seq_len=cfg.seq_len,
        pred_len=cfg.pred_len,
        snr_db=21.0,
    )

    key = jax.random.key(1)
    state, m = train_chunk_dp(state, h, key, **kwargs)  # compile + warmup
    float(m["loss_sum"])  # value-fetch barrier (see utils/profiling._force)

    t0 = time.perf_counter()
    for i in range(reps):
        state, m = train_chunk_dp(state, h, jax.random.fold_in(key, i), **kwargs)
        float(m["loss_sum"])
    dt = (time.perf_counter() - t0) / reps

    samples_per_s = steps_per_chunk * batch / dt
    return {
        "devices": d,
        "global_batch": batch,
        "ms_per_step": round(1000 * dt / steps_per_chunk, 4),
        "samples_per_s": round(samples_per_s, 1),
    }


_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape literal like ``f32[256,90,16]{2,1,0}`` or a
    tuple ``(f32[128], f32[128])``."""
    import re

    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dtype, dims = m.group(1), m.group(2)
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def account_collectives(cfg, tc, *, per_device_batch: int = 128):
    """Compile the DP train chunk on a 2-device mesh and account every
    collective's payload bytes from the optimized HLO (VERDICT round 1,
    "What's weak" #5: per-step collective accounting).

    Returns {op_name: bytes_per_step} plus totals. The byte counts are
    platform-independent (collectives are inserted by SPMD partitioning, not
    backend fusion), so this runs fine on the virtual-CPU mesh.
    """
    import re

    from channelestimationtransformer_tpu.models import build_informer
    from channelestimationtransformer_tpu.parallel.mesh import make_mesh
    from channelestimationtransformer_tpu.train.trainer import (
        create_train_state,
        train_chunk_dp,
    )

    mesh = make_mesh(data=2, devices=jax.devices()[:2])
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    slots = cfg.seq_len + cfg.pred_len + 8
    h = jax.device_put(
        jnp.zeros((256, slots, cfg.enc_in), jnp.float32),
        NamedSharding(mesh, P("data")),
    )
    # One step per chunk: collectives inside the scan body appear once in the
    # HLO but execute once per iteration, so static byte-counting is only
    # per-step-exact at num_steps=1.
    steps = 1
    lowered = jax.jit(
        lambda s, hh, k: train_chunk_dp(
            s, hh, k,
            mesh=mesh, num_steps=steps, per_device_batch=per_device_batch,
            label_len=cfg.label_len, seq_len=cfg.seq_len,
            pred_len=cfg.pred_len, snr_db=21.0,
        )
    ).lower(state, h, jax.random.key(1))
    hlo = lowered.compile().as_text()

    per_op = {}
    n_insts = 0
    for line in hlo.splitlines():
        m = re.search(
            r"=\s*(\([^)]*\)|\S+)\s+(all-reduce|all-gather|reduce-scatter|"
            r"collective-permute|all-to-all)(-start)?\(", line)
        if not m or "-done(" in line:
            continue
        n_insts += 1
        op = m.group(2)
        per_op[op] = per_op.get(op, 0) + _shape_bytes(m.group(1))
    total = sum(per_op.values())
    return {
        "per_op_bytes_per_step": per_op,
        "collective_instructions": n_insts,
        "bytes_per_step": total,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device-counts", default="1,2,4,8")
    ap.add_argument("--per-device-batch", type=int, default=32)
    ap.add_argument("--samples-per-device", type=int, default=512)
    ap.add_argument("--steps-per-chunk", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--full-model",
        action="store_true",
        help="flagship config (use on real hardware; default is a small "
        "model sized for the virtual-CPU fallback)",
    )
    ap.add_argument(
        "--account", action="store_true",
        help="also compile the flagship DP step on a 2-device mesh, count "
        "collective payload bytes from the optimized HLO, and derive the "
        "expected 2-host scaling efficiency from a measured step time",
    )
    ap.add_argument(
        "--step-ms", type=float, default=13.6,
        help="measured single-chip flagship step time (ms) for the --account "
        "efficiency model (default: v5e bench, batch 256)",
    )
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "artifacts")
    )
    args = ap.parse_args()

    counts = sorted(int(c) for c in args.device_counts.split(","))
    from channelestimationtransformer_tpu.core.config import (
        InformerConfig,
        TrainConfig,
    )
    from channelestimationtransformer_tpu.parallel.mesh import (
        ensure_virtual_devices,
    )

    ensure_virtual_devices(counts[-1])
    platform = jax.devices()[0].platform

    if args.full_model:
        cfg = InformerConfig()
    else:
        cfg = InformerConfig(
            seq_len=48, label_len=8, pred_len=5, d_model=32, n_heads=4,
            e_layers=(2, 1), d_layers=2, d_ff=32,
        )
    tc = TrainConfig(batch_size=args.per_device_batch)

    rng = np.random.default_rng(0)
    slots = cfg.seq_len + cfg.pred_len + 8
    host_h = rng.normal(
        size=(args.samples_per_device * counts[-1], slots, cfg.enc_in)
    ).astype(np.float32)

    rows = []
    for d in counts:
        row = measure_device_count(
            d,
            cfg=cfg,
            tc=tc,
            host_h=host_h,
            per_device_batch=args.per_device_batch,
            samples_per_device=args.samples_per_device,
            steps_per_chunk=args.steps_per_chunk,
            reps=args.reps,
        )
        # Per-device baseline from the smallest measured count: efficiency is
        # (samples/s per device) / (baseline samples/s per device), so a run
        # whose --device-counts omits 1 still reports 1.0 for perfect weak
        # scaling instead of 1/d.
        if rows:
            base_per_dev = rows[0]["samples_per_s"] / rows[0]["devices"]
        else:
            base_per_dev = row["samples_per_s"] / row["devices"]
        key = (
            "efficiency_vs_1dev"
            if counts[0] == 1
            else f"efficiency_vs_{counts[0]}dev"
        )
        row[key] = round(row["samples_per_s"] / (row["devices"] * base_per_dev), 3)
        rows.append(row)
        print(json.dumps(row))

    result = {"platform": platform, "weak_scaling": rows}
    if platform == "cpu":
        # Virtual CPU "devices" share one host's cores: adding devices adds
        # no compute, so per-device throughput MUST fall. This table
        # validates that the sharded program runs at N devices — it is NOT a
        # scaling measurement and must not be read as one (VERDICT r4 item
        # 10). The multi-chip scaling evidence is `collective_accounting`
        # (measured HLO collective bytes + link-rate model) plus the
        # MULTICHIP_r0N.json dryruns.
        result["weak_scaling_note"] = (
            "HOST-CONTENTION TABLE, not a scaling result: N virtual CPU "
            "devices time-share one host's cores, so efficiency_vs_1dev "
            "necessarily decays toward 1/N. Use collective_accounting for "
            "multi-chip projections."
        )

    if args.account:
        acct = account_collectives(
            InformerConfig(), TrainConfig(batch_size=256),
            per_device_batch=128,
        )
        # Analytic 2-host model: a ring all-reduce of B payload bytes between
        # N=2 hosts moves B bytes over the inter-host link (reduce-scatter
        # B/2 + all-gather B/2), serialized worst-case against the step.
        b = acct["bytes_per_step"]
        links = {"ici_45GBps": 45e9, "dcn_100gbit": 12.5e9, "dcn_25gbit": 3.125e9}
        model_rows = {}
        for name, bw in links.items():
            t_comm_ms = b / bw * 1e3
            eff = args.step_ms / (args.step_ms + t_comm_ms)
            model_rows[name] = {
                "t_comm_ms": round(t_comm_ms, 4),
                "efficiency_2host_no_overlap": round(eff, 4),
            }
        acct["step_ms"] = args.step_ms
        acct["efficiency_model"] = model_rows
        result["collective_accounting"] = acct
        print(json.dumps(acct, indent=1))

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "scaling.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
