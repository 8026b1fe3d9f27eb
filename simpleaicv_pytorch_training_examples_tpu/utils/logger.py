"""Per-run logger with rotating file + console handlers.

Capability parity with the reference's logging setup
(/root/reference/tools/utils.py:66-92): one named logger per run, a
weekly-rotating file handler under the experiment's log dir, and a stream
handler. Log-gating on process 0 is the caller's job (JAX: `jax.process_index() == 0`).
"""

import logging
import logging.handlers
import os


def get_logger(name: str, log_dir: str) -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    # Avoid duplicate handlers when called twice in one process (tests).
    if logger.handlers:
        return logger

    fmt = logging.Formatter("%(asctime)s %(levelname)s: %(message)s")

    file_handler = logging.handlers.TimedRotatingFileHandler(
        os.path.join(log_dir, f"{name}.log"), when="W0", encoding="utf-8")
    file_handler.setFormatter(fmt)
    logger.addHandler(file_handler)

    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(fmt)
    logger.addHandler(stream_handler)

    logger.propagate = False
    return logger
