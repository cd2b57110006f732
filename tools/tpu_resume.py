"""Re-claim the axon TPU session of a dead client.

When a TPU client dies abruptly, the terminal's session claim stays
held by its session_id and every NEW session blocks ~25 min in
make_c_api_client and then fails UNAVAILABLE, for hours.  But the
session_id is just a uuid4 the client generated at interpreter start
(sitecustomize.py); it survives in the dead process's heap.  Scrape it
BEFORE killing (scan /proc/<pid>/mem for uuid4 strings), then run

    PALLAS_AXON_POOL_IPS= python tools/tpu_resume.py <session_id>

(empty POOL_IPS stops sitecustomize from auto-registering with a fresh
uuid).  This registers the axon plugin with the dead client's
session_id — the terminal sees the same session resuming rather than a
competing claim — runs one tiny op, and exits cleanly, releasing the
claim for the next normal process.
"""

import faulthandler
import os
import sys
import time


def main() -> None:
    faulthandler.dump_traceback_later(120, repeat=True)
    sid = sys.argv[1]
    os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    os.environ["AXON_LOOPBACK_RELAY"] = "1"
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    rc = os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1") == "1"
    from axon.register import register

    register(
        None,
        f"{gen}:1x1x1",
        so_path="/opt/axon/libaxon_pjrt.so",
        session_id=sid,
        remote_compile=rc,
    )
    t0 = time.time()
    print(f"resuming session {sid} ...", flush=True)
    import jax

    devs = jax.devices()
    print(f"devices after {time.time() - t0:.1f}s: {devs}", flush=True)
    import jax.numpy as jnp
    import numpy as np

    y = np.asarray(jnp.arange(8.0).sum())
    print(f"compute ok ({y}) after {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
