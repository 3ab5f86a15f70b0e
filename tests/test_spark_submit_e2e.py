"""north_rule shipping clause: "ships as a spark-submit --py-files job".

This test builds the distributable artifact (deepblocker_spark.zip), runs
the real `spark-submit` binary with `--py-files` against a fixture parquet
in the input_hint schema, and verifies the emitted (id, component) clusters
clear the pairwise-F1 >= 0.99 gate — computed here in pure pandas so the
check shares nothing with the engine under test.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import zipfile
from itertools import combinations

import pandas as pd
import pytest

import deepblocker_spark
from deepblocker_spark.fixtures import repo_file_table

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

RUNNER = """\
import sys
from deepblocker_spark.__main__ import main
sys.exit(main())
"""


def build_pyfiles_zip(dest: str) -> str:
    """Package deepblocker_spark/ exactly as a deployment would:
    `zip -r deepblocker_spark.zip deepblocker_spark` (sources only)."""
    pkg_dir = os.path.dirname(os.path.abspath(deepblocker_spark.__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return dest


def _durable_id(repo: str, path: str, commit: str) -> str:
    return hashlib.sha256(f"{repo}\x1f{path}\x1f{commit}".encode()).hexdigest()


def _pairs_from_groups(df: pd.DataFrame, key: str) -> set[tuple[str, str]]:
    out: set[tuple[str, str]] = set()
    for _, grp in df.groupby(key):
        ids = sorted(grp["id"])
        out.update(combinations(ids, 2))
    return out


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_pipeline(tmp_path):
    pdf, _ = repo_file_table(n_clusters=40, max_dups=4, seed=7)
    in_path = str(tmp_path / "repo_files.parquet")
    pdf.drop(columns=["_cluster"]).to_parquet(in_path)

    zip_path = build_pyfiles_zip(str(tmp_path / "deepblocker_spark.zip"))
    runner = tmp_path / "run.py"
    runner.write_text(RUNNER)
    out_path = str(tmp_path / "clusters.parquet")

    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    # The driver must import the package from the zip alone: strip the repo
    # from PYTHONPATH and run from a neutral cwd.
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--py-files", zip_path,
            str(runner),
            "--input", in_path,
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--output", out_path,
            "--cols", "repo,path,lang,content",
            "--id-col", "id",
            "--k", "20",
            "--emb-dim", "64",
            "--verify-jaccard", "0.4",
        ],
        capture_output=True, text=True, timeout=900, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["clusters_rows"] > 0
    stages = [m["stage"] for m in summary["lineage"]]
    assert stages == ["embeddings", "candidates", "scored", "clusters"]

    clusters = pd.read_parquet(out_path)  # (id, component)
    gold = pdf.copy()
    gold["id"] = [
        _durable_id(r, p, c) for r, p, c in zip(gold["repo"], gold["path"], gold["commit"])
    ]
    pred_pairs = _pairs_from_groups(clusters, "component")
    gold_pairs = _pairs_from_groups(gold, "_cluster")
    tp = len(pred_pairs & gold_pairs)
    prec = tp / max(len(pred_pairs), 1)
    rec = tp / max(len(gold_pairs), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    assert f1 >= 0.99, {"precision": prec, "recall": rec, "f1": f1}
