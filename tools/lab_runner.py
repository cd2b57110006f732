"""Run several perf-lab tools sequentially in ONE process.

The axon TPU lease transitions are slow (minutes between processes) and
a killed holder wedges the chip for a long time — so measurements are
batched: one process, one lease, several labs.  Each lab main() runs
guarded; a failure is reported and the next lab still runs.

Usage:  python tools/lab_runner.py perf_multiscan2 perf_sweep_parts ...
"""

import faulthandler
import importlib
import sys
import time
import traceback


def main(names):
    faulthandler.dump_traceback_later(300, repeat=True)
    sys.path.insert(0, "/root/repo/tools")
    for name in names:
        print(f"=== {name} ===", flush=True)
        t0 = time.perf_counter()
        try:
            mod = importlib.import_module(name)
            # a long-waiting runner may hold module objects imported
            # hours ago — reload so the lab measures CURRENT code
            # (buildingsegment_tpu itself still reflects import time;
            # prefer fresh processes for package changes)
            mod = importlib.reload(mod)
            mod.main()
        except Exception:
            traceback.print_exc()
        print(f"=== {name} done in {time.perf_counter() - t0:.1f}s ===",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
