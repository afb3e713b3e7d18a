"""A/B the shared-encoder pair forward (TDVC_SHARED_ENC) on real TPU.

Usage: python tools/bench_shared_enc.py CONFIG BATCH [iters] [flag...]
  CONFIG: conv_enc | wavlm ; flag... subset of {1,0} (default both)

Prints one line per flag: config, flag, step seconds, samples/s.
Honest sync timing: bench.bench_train ends its window with a device fetch.
"""
import sys

sys.path.insert(0, "/root/repo")

import os


def main():
    cfgname = sys.argv[1] if len(sys.argv) > 1 else "conv_enc"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    flags = sys.argv[4:] or ["1", "0"]
    config = f"/root/reference/config/{cfgname}-stage2_2.yaml"
    import bench

    for flag in flags:
        os.environ["TDVC_SHARED_ENC"] = flag
        sps, step_s, cfg, G, state = bench.bench_train(
            config, "bfloat16", batch, remat=False, iters=iters)
        print(f"{cfgname} b{batch} SHARED_ENC={flag}: {step_s:.5f} s/step "
              f"= {sps:,.0f} samples/s", flush=True)
        del cfg, G, state
        import gc
        import jax
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main()
