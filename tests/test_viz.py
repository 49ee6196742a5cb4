import os

import pytest

from svscope_tpu.cli import main

from synth import make_test_pair


def test_viz_cli(tmp_path):
    d = str(tmp_path)
    ref, tumor, normal, recs, refseq = make_test_pair(d, seed=2)
    out = main(["viz", "-w", "chr1:1000-1100", "-T", tumor, "-N", normal,
                "-t", "S", "-n", "S", "-r", ref, "-s", d + "/viz"])
    assert out.endswith("chr1_1000-1100.window.png")
    assert os.path.getsize(out) > 20_000  # a real rendered figure


def test_viz_window_without_reads(tmp_path):
    d = str(tmp_path)
    ref, tumor, normal, recs, refseq = make_test_pair(d, seed=2)
    with pytest.raises(Exception):
        main(["viz", "-w", "chr1:58000-58100", "-T", tumor, "-N", normal,
              "-t", "S", "-n", "S", "-r", ref, "-s", d + "/viz"])
