"""MSM dispatch — host Pippenger for small batches, device for large.

Reference: src/ffiasm/multiexp.c.hpp dispatches by size/threads; here the
cutover covers the XLA compile+transfer overhead of the device pipeline
(ops/bn254_device.py). `ZK_DEVICE_MSM` forces a side: "1" always device,
"0" always host (useful on CPU-only test hosts where the device path is
the same core anyway).
"""

from __future__ import annotations

import os

from . import bn254 as host

DEVICE_THRESHOLD = 4096


def _use_device(n: int) -> bool:
    env = os.environ.get("ZK_DEVICE_MSM")
    if env is not None:
        return env not in ("0", "")
    return n >= DEVICE_THRESHOLD


def g1_msm(points, scalars):
    if _use_device(len(points)):
        from . import bn254_device as dev

        return dev.g1_msm_device(points, scalars)
    return host.g1_msm(points, scalars)


def g2_msm(points, scalars):
    if _use_device(len(points)):
        from . import bn254_device as dev

        return dev.g2_msm_device(points, scalars)
    return host.g2_msm(points, scalars)
