"""Measure the axon tunnel's host↔device transfer speeds + latency.

The multiscan (config 5) pipeline moves ~10 MB/scan through the tunnel
(uint16 position upload, int16 label fetch); if the link runs at tens
of MB/s it — not device compute — bounds the metric.  This probe pins
down: scalar round-trip latency, D2H bandwidth (np.asarray of a
device-resident array), and H2D bandwidth (device_put + a forced
1-element read of the result, minus the scalar latency).

Run on the real chip:  python tools/perf_tunnel.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    out = {}

    # warm the device + plugin
    x = jnp.zeros((8, 128), jnp.float32) + 1.0
    np.asarray(x[0, 0])

    # scalar round-trip latency
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(x[0, 0])
        lat.append(time.perf_counter() - t0)
    out["latency_ms_median"] = round(sorted(lat)[len(lat) // 2] * 1e3, 1)
    out["latency_ms_min"] = round(min(lat) * 1e3, 1)

    touch = jax.jit(lambda a: a.ravel()[0] + a.ravel()[-1])

    for mb in (1, 4, 16, 64):
        n = mb * (1 << 20)
        # D2H: device-resident uint8 array fetched whole
        dev = jax.jit(
            lambda: jnp.arange(n, dtype=jnp.int32).astype(jnp.uint8)
        )()
        np.asarray(dev.ravel()[0])  # ensure materialized
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            h = np.asarray(dev)
        dt = (time.perf_counter() - t0) / reps
        out[f"d2h_{mb}mb_MBps"] = round(mb / dt, 1)

        # H2D: device_put + forced touch (scalar fetch), minus latency
        host = np.random.randint(0, 255, n, dtype=np.uint8)
        t0 = time.perf_counter()
        for _ in range(reps):
            d = jax.device_put(host)
            np.asarray(touch(d))
        dt = (time.perf_counter() - t0) / reps - min(lat)
        out[f"h2d_{mb}mb_MBps"] = round(mb / max(dt, 1e-9), 1)

    # D2H at the multiscan label-fetch shape/dtype (int16 [1.25M])
    n = 1310720
    dev = jax.jit(lambda: jnp.arange(n, dtype=jnp.int32).astype(jnp.int16))()
    np.asarray(dev.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(dev)
    out["d2h_labels_i16_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
