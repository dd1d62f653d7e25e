"""End-to-end smoke of the flagship driver at miniature scale.

Exercises scripts/flagship.py's three stages (gen → train → predict) on
CPU with ~0.5%-length genomes: genome synthesis with planted repeats,
read simulation with the vendored length distributions, the overlap-graph
builder, oracle labeling, a 2-epoch training run, checkpoint/best-model
save, and greedy decode + N50/NG50 reporting — the same path as the
recorded model_15xchr19 run (docs/FLAGSHIP.md), 1000× smaller.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flagship_driver_end_to_end(tmp_path):
    root = tmp_path / "fs"
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "flagship.py"),
         "--root", str(root), "--scale", "0.005",
         "--train-spec", "chr19:2", "--valid", "chr19", "--test", "chr21",
         "--out", "fs_smoke", "--epochs", "2"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    pretrained = os.path.join(REPO, "pretrained", "model_fs_smoke.npz")
    try:
        assert out.returncode == 0, out.stderr[-3000:]
        assert "FLAGSHIP ASSEMBLY chr21" in out.stdout, out.stdout[-3000:]
        assert os.path.exists(pretrained)
        # the report line carries real numbers (contigs + reconstructed %)
        line = [l for l in out.stdout.splitlines()
                if "FLAGSHIP ASSEMBLY" in l][0]
        assert "contigs" in line and "reconstructed" in line
    finally:
        if os.path.exists(pretrained):
            os.remove(pretrained)
