"""Driver-hook smoke tests: keep __graft_entry__ compiling on CPU meshes."""
import importlib.util
import os
import sys

import jax


def load_graft():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_small():
    graft = load_graft()
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].n_edges_padded


def test_dryrun_multichip_8():
    graft = load_graft()
    graft.dryrun_multichip(8)
