"""YAML configuration with environment-variable interpolation.

``${VAR}`` and ``${VAR:default}`` placeholders anywhere in the YAML text
are substituted from the process environment before parsing
(reference src/ketl/config.py:10-57). Unset variables without a default
raise.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import IO, Any

try:
    import yaml
except ImportError:  # pragma: no cover - pyyaml ships with pyspark deps
    yaml = None

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")


def interpolate_env(text: str, env: dict[str, str] | None = None) -> str:
    env = os.environ if env is None else env  # type: ignore[assignment]

    def sub(m: re.Match) -> str:
        name, default = m.group(1), m.group(2)
        if name in env:
            return env[name]
        if default is not None:
            return default
        raise KeyError(f"config references unset environment variable {name!r}")

    return _ENV_RE.sub(sub, text)


def load_config(
    source: str | Path | IO[str], env: dict[str, str] | None = None
) -> Any:
    """Load YAML (path, handle, or literal text) with env interpolation."""
    if yaml is None:
        raise ImportError("pyyaml is required for load_config")
    if hasattr(source, "read"):
        text = source.read()
    else:
        p = Path(str(source))
        try:
            is_file = p.is_file()
        except OSError:  # e.g. a long YAML literal passed as str
            is_file = False
        text = p.read_text(encoding="utf-8") if is_file else str(source)
    return yaml.safe_load(interpolate_env(text, env))
