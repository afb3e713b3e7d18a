"""A/B a step-shaping env flag on real TPU with honest sync timing.

Usage: python tools/bench_env_ab.py FLAG CONFIG BATCH [iters] [values...]
  FLAG:   e.g. TDVC_REUSE_REC_EMB | TDVC_SHARED_ENC
  CONFIG: conv_enc | wavlm ; values... subset of {1,0} (default both)

Prints one line per value: config, flag=value, step seconds, samples/s.
bench.bench_train ends its timing window with a real device fetch
(block_until_ready lies on axon — see bench.py module docstring).
"""
import sys

sys.path.insert(0, "/root/repo")

import os


def main():
    flag = sys.argv[1]
    cfgname = sys.argv[2] if len(sys.argv) > 2 else "conv_enc"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    values = sys.argv[5:] or ["1", "0"]
    config = f"/root/reference/config/{cfgname}-stage2_2.yaml"
    import bench

    for value in values:
        os.environ[flag] = value
        sps, step_s, cfg, G, state = bench.bench_train(
            config, "bfloat16", batch, remat=False, iters=iters)
        print(f"{cfgname} b{batch} {flag}={value}: {step_s:.5f} s/step "
              f"= {sps:,.0f} samples/s", flush=True)
        del cfg, G, state
        import gc
        import jax
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main()
