"""Operational logging: structured rotating per-level log files.

Parity with the reference's logging stack (`app/utils/logger.py:32-36`
LoggerFactory → RotatingFileHandler 5 MB × 10, `app/utils/
logs_re_namer.py` numbered rotation naming ``debug.log.1 →
debug1.log``, `app/utils/log_initializer.py` directory bootstrap,
format ``[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s`` with
propagation off) — implemented independently on stdlib ``logging``.

Log root resolves from ``SPARK_GRAFT_LOG_DIR`` (default
``<repo>/logs``); each level writes to its own subdirectory
(``info/info.log``, ``error/error.log``, ``debug/debug.log``). On a
cluster, point the root at node-local scratch and ship via the
platform's log aggregation — rotation bounds local disk either way.
"""

from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler
from pathlib import Path

_FORMAT = "[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s"
_MAX_BYTES = 5 * 1024 * 1024
_BACKUPS = 10

_LEVELS = {
    "info": logging.INFO,
    "error": logging.ERROR,
    "debug": logging.DEBUG,
}


def _log_root() -> Path:
    env = os.environ.get("SPARK_GRAFT_LOG_DIR")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[1] / "logs"


def numbered_namer(default_name: str) -> str:
    """Rotation naming: ``info.log.1`` → ``info1.log`` (reference
    `logs_re_namer.py` behavior)."""
    p = Path(default_name)
    if "." in p.name:
        stem, idx = p.name.rsplit(".", 1)
        if idx.isdigit():
            return str(p.with_name(f"{stem.replace('.log', '')}{idx}.log"))
    return default_name


def get_logger(kind: str = "info") -> logging.Logger:
    """Per-level singleton logger writing to ``<root>/<kind>/<kind>.log``
    with 5 MB × 10 numbered rotation; duplicate-handler safe."""
    if kind not in _LEVELS:
        raise ValueError(f"unknown log kind {kind!r}; expected {sorted(_LEVELS)}")
    logger = logging.getLogger(f"data_ingestion_pimcore_spark.{kind}")
    if logger.handlers:
        return logger
    logger.setLevel(_LEVELS[kind])
    log_dir = _log_root() / kind
    log_dir.mkdir(parents=True, exist_ok=True)
    handler = RotatingFileHandler(
        log_dir / f"{kind}.log", maxBytes=_MAX_BYTES, backupCount=_BACKUPS
    )
    handler.namer = numbered_namer
    handler.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(handler)
    logger.propagate = False
    return logger
