"""Leveled logger with terminal/file output and JSON dumps.

Rebuild of the reference Logger (ninpol/_interpolator/logger.pyx:13-104):
timestamped leveled messages to the terminal or to ``.ninpollog/`` files
with a collision-avoiding index suffix, plus a JSON dump facility that
converts numpy arrays.
"""
from __future__ import annotations

import json
import os
from datetime import datetime

import numpy as np


def arr_to_dict(arr):
    """numpy array -> {index: value} dict (reference: utils/common.py:3-8)."""
    return {i: (v.tolist() if isinstance(v, np.ndarray) else v)
            for i, v in enumerate(arr)}


class Logger:
    def __init__(self, log_name, terminal=True, directory="", logging=False):
        self.last_index = 0
        suffix = "-" + datetime.now().strftime("%y%m%d")

        self.filename = f"{log_name}{suffix}_{self.last_index}.log"
        self.json_filename = f"{log_name}{suffix}_{self.last_index}.json"
        self.terminal = terminal
        self.directory = directory
        self.logging = logging
        self.data = {}

        if self.directory == "" and not terminal:
            self.directory = os.path.join(os.getcwd(), ".ninpollog")

        self.filename = os.path.join(self.directory, self.filename)
        self.json_filename = os.path.join(self.directory, self.json_filename)

        if not terminal:
            if not os.path.exists(self.directory):
                os.makedirs(self.directory)
            else:
                while (os.path.exists(self.filename)
                       or os.path.exists(self.json_filename)):
                    self.last_index += 1
                    self.filename = os.path.join(
                        self.directory,
                        f"{log_name}{suffix}_{self.last_index}.log")
                    self.json_filename = os.path.join(
                        self.directory,
                        f"{log_name}{suffix}_{self.last_index}.json")

    def log(self, message, level="INFO"):
        if not self.logging:
            return
        full = (f"[{level:<5}] "
                f"({datetime.now().strftime('%H:%M:%S'):<8}) {message}\n")
        if self.terminal:
            print(full, end="")
        else:
            with open(self.filename, "a") as f:
                f.write(full)

    def np_to_list(self, data):
        sdata = {str(k): v for k, v in data.items()}
        for k, v in sdata.items():
            if isinstance(v, np.ndarray):
                sdata[k] = arr_to_dict(v)
            elif isinstance(v, dict):
                sdata[k] = self.np_to_list(v)
        return sdata

    def json(self, member_name, data):
        if self.terminal:
            self.log("Logging to JSON is not supported in terminal mode",
                     "WARN")
        data = self.np_to_list(data)
        self.data[member_name] = {
            "timestamp": datetime.now().strftime("%H:%M:%S"),
            "data": data,
        }
        if self.json_filename and not self.terminal:
            with open(self.json_filename, "w") as f:
                json.dump(self.data, f, indent=2, default=str)
