"""bench.py key-cache round-trip: a cached key must sign correctly.

The bench caches the deterministic S=1 keygen output as ints
(benches/bench_key_<bits>.json) so driver runs skip safe-prime generation;
this pins the save->load->sign path at a small width.
"""

import importlib.util
import os

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.utils.rng import SessionRng


def test_key_cache_roundtrip(tmp_path):
    rng = SessionRng(0xBE7C)
    kg = gg20.keygen(1, 1, 3, rng, paillier_bits=768)
    assert kg.ok.all()
    path = str(tmp_path / "bench_key_768.json")
    bench._save_key(path, kg.key)
    key = bench._load_key(path)
    assert key is not None
    # loaded ints match
    for f in ("p", "q", "u", "x"):
        assert (np.asarray(getattr(key, f)) == np.asarray(getattr(kg.key, f))).all()
    # and the loaded key signs a valid signature end-to-end
    key2 = bench._tile_key(key, 2)
    off = gg20.offline_stage(key2, [0, 1], rng)
    assert off.ok.all()
    sig = gg20.sign_online(off, 0x1234567890ABCDEF)
    assert sig.sig_valid.all()


def test_load_missing_returns_none(tmp_path):
    assert bench._load_key(str(tmp_path / "nope.json")) is None
