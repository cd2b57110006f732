"""Run a TPU workload under a RECORDED axon session_id.

sitecustomize registers the axon plugin with a random uuid4, so when a
TPU client dies its claim can only be resumed by scraping the uuid out
of the dead process's heap (tools/tpu_resume.py).  This wrapper makes
recovery deterministic: it registers with a fresh uuid that it first
writes to /tmp/bst_tpu_session, then runs the requested tool mains in
this one process (same contract as tools/lab_runner.py).  If the
process wedges or is killed, run

    PALLAS_AXON_POOL_IPS= python tools/tpu_resume.py $(cat /tmp/bst_tpu_session)

and the claim is back instantly (verified 2026-08-18: resume
re-registered a killed client's session and got devices in 0.1 s,
vs the hours-long UNAVAILABLE wedge a fresh session sees).

Usage:
    PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo:$PYTHONPATH \
        python tools/tpu_run.py perf_stats_lab perf_knn_lab ...

(PALLAS_AXON_POOL_IPS must be EMPTY so sitecustomize skips its own
random-uuid registration; this script re-creates its env setup.)
"""

import faulthandler
import importlib
import os
import sys
import time
import traceback
import uuid

SESSION_FILE = "/tmp/bst_tpu_session"


def register_recorded_session() -> str:
    os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    os.environ["AXON_LOOPBACK_RELAY"] = "1"
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    rc = os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1") == "1"
    sid = os.environ.get("BST_TPU_SESSION") or str(uuid.uuid4())
    with open(SESSION_FILE, "w") as f:
        f.write(sid)
    from axon.register import register

    register(
        None,
        f"{gen}:1x1x1",
        so_path="/opt/axon/libaxon_pjrt.so",
        session_id=sid,
        remote_compile=rc,
    )
    return sid


def main(names):
    faulthandler.dump_traceback_later(300, repeat=True)
    sid = register_recorded_session()
    print(f"[tpu_run] session {sid}", flush=True)
    sys.path.insert(0, "/root/repo/tools")
    for name in names:
        print(f"=== {name} ===", flush=True)
        t0 = time.perf_counter()
        try:
            mod = importlib.import_module(name)
            mod = importlib.reload(mod)
            mod.main()
        except Exception:
            traceback.print_exc()
        print(
            f"=== {name} done in {time.perf_counter() - t0:.1f}s ===",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:])
