"""Wait for the axon TPU backend to come back, then run lab mains.

Backend-init failures are not cached by jax, so a single process can
retry until the terminal's session lock expires.  Each attempt itself
blocks for up to ~25 min inside make_c_api_client, so the loop is slow
but safe — and holds no chip while waiting.

Usage:  python tools/tpu_wait_and_run.py perf_multiscan2 ...
"""

import sys
import time


def main(names):
    import jax

    attempt = 0
    while True:
        attempt += 1
        try:
            n = len(jax.devices())
            print(f"backend up after {attempt} attempts: {n} device(s)",
                  flush=True)
            break
        except Exception as e:
            print(f"attempt {attempt}: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            time.sleep(120)
    from lab_runner import main as run

    run(names)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/tools")
    main(sys.argv[1:])
