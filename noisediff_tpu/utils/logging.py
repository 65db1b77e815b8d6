"""Logging and scalar observability.

Parity targets: setup_logger / print_args (utils/util.py:62-80) and the
trainers' tensorboardX scalar streams (trainer_diffusion.py:204-208,
trainer_denoising.py:250-257). tensorboardX isn't guaranteed on TPU hosts,
so scalars always go to a JSONL event file (machine-readable, greppable) and
mirror into tensorboardX when available.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional


def setup_logger(log_file_path: str) -> None:
    fmt = logging.Formatter("%(asctime)s [%(levelname)-5.5s]  %(message)s")
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    os.makedirs(os.path.dirname(log_file_path) or ".", exist_ok=True)

    fh = logging.FileHandler(log_file_path, encoding="utf-8")
    fh.setFormatter(fmt)
    root.addHandler(fh)

    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)
    logging.info("Logging file is %s", log_file_path)


def print_args(args) -> None:
    for arg in vars(args):
        logging.info("%s:%s", arg, getattr(args, arg))


class ScalarLogger:
    """JSONL scalar stream with optional tensorboardX mirroring."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, "scalars.jsonl"), "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._fh.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "t": time.time()})
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
