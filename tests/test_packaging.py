"""Packaging: the --py-files zip must be importable standalone."""

import os
import subprocess
import sys


def test_pyfiles_zip_importable(tmp_path):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.package_pyfiles import build_zip

    zip_path = build_zip(str(tmp_path / "pkg.zip"))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from readability_1_spark import extract_one; "
        "r = extract_one('<html><head><title>T</title></head>"
        "<body><p>hi</p></body></html>'); "
        "print(r['status'])" % zip_path
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() in ("ok", "null_result")


def test_spark_submit_end_to_end(tmp_path, spark):
    """The north rule's deployment shape, literally: spark-submit
    --py-files <zip> jobs/extract_job.py over a parquet transcripts table,
    then assert the job wrote extractions + lineage + checkpoints."""
    import shutil

    from tools.package_pyfiles import build_zip

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    # Small input: the committed smoke transcripts (first 40 rows).
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "wh")
    smoke = spark.read.parquet(os.path.join(repo, "tests", "goldens",
                                            "transcripts_smoke.parquet"))
    smoke.limit(40).coalesce(1).write.parquet(in_dir)

    zip_path = build_zip(str(tmp_path / "pkg.zip"))
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    out = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(repo, "jobs", "extract_job.py"),
         "--input", in_dir, "--output", out_dir,
         "--run-id", "submitrun", "--num-parts", "8"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "run_id=submitrun" in out.stdout
    ex = spark.read.parquet(os.path.join(out_dir, "extractions"))
    assert ex.filter(ex.status == "ok").count() > 0
    ck = spark.read.parquet(os.path.join(out_dir, "checkpoints"))
    assert ck.filter(ck.run_id == "submitrun").count() > 0
    assert spark.read.parquet(os.path.join(out_dir, "lineage")).count() > 0


def test_spark_submit_tokenize_job(tmp_path, spark):
    """Tokenized-shards deployment shape: spark-submit --py-files <zip>
    jobs/tokenize_job.py over a documents table writes per-doc token ids,
    packed fixed-length sequences, and the vocabulary; the packed stream
    reassembles to the per-doc ids + EOS boundaries exactly."""
    import shutil

    from tools.package_pyfiles import build_zip

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    out_dir = str(tmp_path / "tok")
    zip_path = build_zip(str(tmp_path / "pkg.zip"))
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    out = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(repo, "jobs", "tokenize_job.py"),
         "--sf-dir", "/root/testdata/sf0.001", "--output", out_dir,
         "--seq-len", "64", "--n-ranges", "8", "--shards", "4"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "tokenize_job: docs=" in out.stdout
    ids = spark.read.parquet(out_dir + "/token_ids")
    seqs = spark.read.parquet(out_dir + "/sequences")
    vocab = spark.read.parquet(out_dir + "/vocab")
    eos = vocab.filter(vocab.sym == "<EOS>").collect()[0].id
    # reassembly invariant across the job boundary
    doc_rows = sorted((r.doc_id, list(r.token_ids)) for r in ids.collect())
    stream = [t for _d, tids in doc_rows for t in tids + [eos]]
    packed = sorted((r.seq_id, list(r.token_ids)) for r in seqs.collect())
    flat = [t for _s, tids in packed for t in tids]
    assert flat == stream
    assert all(len(tids) == 64 for _s, tids in packed[:-1])
    # every id is inside the vocabulary (incl. EOS)
    assert max(flat) <= eos and min(flat) >= 0
