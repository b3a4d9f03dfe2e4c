"""Environment-variable flags."""
from __future__ import annotations

import os


def env_flag(name: str) -> bool:
    """True iff the env var is set to a truthy value.

    `FLAG=0`, `FLAG=` and unset all read as False ("off"), so exporting
    `GFS3D_NO_PACKED=0` does NOT accidentally disable the packed path.
    """
    return os.environ.get(name, "").strip().lower() not in (
        "", "0", "false", "no", "off")
