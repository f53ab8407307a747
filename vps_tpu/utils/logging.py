"""Rank-0 logging + seeding (reference mmdet/apis/env.py:53-69)."""

from __future__ import annotations

import logging
import random

import numpy as np
import jax


def get_root_logger(log_level=logging.INFO, log_file=None):
    logger = logging.getLogger("vps_tpu")
    if logger.handlers:
        return logger
    fmt = "%(asctime)s - %(levelname)s - %(message)s"
    handlers = [logging.StreamHandler()]
    if log_file:
        handlers.append(logging.FileHandler(log_file))
    for h in handlers:
        h.setFormatter(logging.Formatter(fmt))
        logger.addHandler(h)
    rank = jax.process_index()
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    return logger


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
