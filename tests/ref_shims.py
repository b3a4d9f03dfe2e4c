"""Shared import shims for running the REFERENCE's code in-process.

Single owner of the transforms3d stub (faithful zoom / axis-angle math so
the reference's augment_pointcloud computes its real matrices) — every
oracle test must install it through here rather than registering its own
module, or test-ordering determines which (possibly attribute-less) stub
wins in sys.modules.
"""
import sys
import types

import numpy as np


def zfdir2mat(factor, direction=None):
    """Faithful transforms3d.zooms.zfdir2mat: uniform zoom when direction
    is None, else I + (factor-1) * outer(n, n) along the unit direction."""
    if direction is None:
        return np.diag([float(factor)] * 3).astype(np.float64)
    n = np.asarray(direction, np.float64)
    n = n / np.sqrt((n ** 2).sum())
    return np.eye(3) + (float(factor) - 1.0) * np.outer(n, n)


def axangle2mat(axis, angle, is_normalized=False):
    """Faithful transforms3d.axangles.axangle2mat (Rodrigues)."""
    x, y, z = np.asarray(axis, np.float64)
    if not is_normalized:
        n = np.sqrt(x * x + y * y + z * z)
        x, y, z = x / n, y / n, z / n
    c, s = np.cos(angle), np.sin(angle)
    C = 1.0 - c
    return np.array([
        [x * x * C + c, x * y * C - z * s, z * x * C + y * s],
        [x * y * C + z * s, y * y * C + c, y * z * C - x * s],
        [z * x * C - y * s, y * z * C + x * s, z * z * C + c]])


def install_transforms3d_stub():
    """Register (or upgrade in place) the faithful transforms3d stub.

    Tolerates a pre-existing bare/partial stub from an earlier test module
    in the same session: submodules are created when missing and the
    function attributes always (re)point at the faithful implementations.
    """
    t3d = sys.modules.get("transforms3d")
    if t3d is None:
        t3d = types.ModuleType("transforms3d")
        sys.modules["transforms3d"] = t3d
    for sub in ("zooms", "axangles"):
        mod = getattr(t3d, sub, None) or sys.modules.get(f"transforms3d.{sub}")
        if mod is None:
            mod = types.ModuleType(f"transforms3d.{sub}")
        setattr(t3d, sub, mod)
        sys.modules[f"transforms3d.{sub}"] = mod
    t3d.zooms.zfdir2mat = zfdir2mat
    t3d.axangles.axangle2mat = axangle2mat
