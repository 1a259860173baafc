#!/usr/bin/env python
"""Build + run the measured CPU baseline (benches/cpu_baseline.cpp).

The reference implementation computes on GMP (curv/rust-gmp); this driver
compiles the same GG20 2-of-3 offline+online flow against the system
libgmp.so.10 and measures signatures/sec on this host — the denominator of
bench.py's vs_baseline (see BASELINE.md).  Usage:

    python benches/cpu_baseline.py [sessions] [threads]
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "cpu_baseline.cpp")
BIN = os.path.join(HERE, "cpu_baseline")
GMP = "/lib/x86_64-linux-gnu/libgmp.so.10"


def build():
    if os.path.exists(BIN) and os.path.getmtime(BIN) >= os.path.getmtime(SRC):
        return
    subprocess.check_call(
        ["g++", "-O3", "-std=c++17", "-o", BIN, SRC, GMP, "-lpthread"], cwd=HERE
    )


def run(sessions=20, threads=None):
    build()
    args = [BIN, str(sessions)]
    if threads:
        args.append(str(threads))
    out = subprocess.check_output(args).decode()
    return json.loads(out.strip().splitlines()[-1])


if __name__ == "__main__":
    sessions = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else None
    print(json.dumps(run(sessions, threads)))
