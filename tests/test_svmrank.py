"""SVMrank subprocess integration (QryEval.java:319-351 / :473-498): exec
the real binaries when present — faked here with tiny scripts, like the
fake-ffmpeg video test — and fall back to LinearSVC otherwise."""

import math
import os
import stat

import pytest

from search_engine_spark.engine import svmrank
from search_engine_spark.engine.letor import FEATURE_COLS, svmrank_lines

FAKE_LEARN = """#!/usr/bin/env python3
import sys
c, train, model = sys.argv[2], sys.argv[3], sys.argv[4]
n = sum(1 for line in open(train) if line.strip())
with open(model, "w") as f:
    f.write(f"FAKEMODEL c={c} n={n}\\n")
"""

# score = 2*f1, or nan when f1 < 0 (exercises the QryEval:523-524 guard)
FAKE_CLASSIFY = """#!/usr/bin/env python3
import sys
test, model, pred = sys.argv[1], sys.argv[2], sys.argv[3]
assert open(model).read().startswith("FAKEMODEL"), "model file not from learn"
with open(pred, "w") as out:
    for line in open(test):
        if not line.strip():
            continue
        body = line.split(" # ")[0]
        feats = dict(
            tok.split(":", 1) for tok in body.split()[2:] if ":" in tok
        )
        v = float(feats["1"])
        out.write(("nan" if v < 0 else str(v * 2.0)) + "\\n")
"""

FAKE_FAIL = """#!/usr/bin/env python3
import sys
sys.stderr.write("boom\\n")
sys.exit(3)
"""


def _script(tmp_path, name: str, body: str) -> str:
    p = tmp_path / name
    p.write_text(body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


def _rows(vals):
    """Candidate rows with f1 = vals[i], other features constant."""
    out = []
    for i, v in enumerate(vals):
        r = {"docid": i, "ext_docid": f"repo{i}:src/a.py@{'0' * 40}"}
        for c in FEATURE_COLS:
            r[c] = float(v) if c == "f1" else 0.5
        out.append(r)
    return out


@pytest.fixture(autouse=True)
def fresh_resolution(monkeypatch):
    """Each test starts with an empty resolve-once cache and no PATH hits."""
    monkeypatch.setattr(svmrank, "_RESOLVED", {})
    monkeypatch.delenv("SVM_RANK_LEARN", raising=False)
    monkeypatch.delenv("SVM_RANK_CLASSIFY", raising=False)


def test_resolve_env_override(tmp_path, monkeypatch):
    learn = _script(tmp_path, "svm_rank_learn", FAKE_LEARN)
    monkeypatch.setenv("SVM_RANK_LEARN", learn)
    assert svmrank.resolve_binary("learn") == learn
    # resolved once: changing the env after first resolve is ignored
    monkeypatch.setenv("SVM_RANK_LEARN", "/nonexistent")
    assert svmrank.resolve_binary("learn") == learn


def test_learn_then_classify_roundtrip(tmp_path):
    learn = _script(tmp_path, "learn.py", FAKE_LEARN)
    classify = _script(tmp_path, "classify.py", FAKE_CLASSIFY)
    train = svmrank_lines(_rows([0.1, 0.9]), "1", labels={1: 2})
    model = svmrank.svmrank_learn(train, 0.001, learn, workdir=str(tmp_path))
    assert open(model).read() == "FAKEMODEL c=0.001 n=2\n"
    test = svmrank_lines(_rows([0.25, -1.0, 0.75]), "2")
    scores = svmrank.svmrank_classify(test, model, classify, workdir=str(tmp_path))
    assert scores == [0.5, 0.0, 1.5]  # 2*f1; nan (f1<0) zeroed per :523-524
    assert not any(math.isnan(s) for s in scores)


def test_learn_failure_raises(tmp_path):
    bad = _script(tmp_path, "bad.py", FAKE_FAIL)
    with pytest.raises(RuntimeError, match="exited 3"):
        svmrank.svmrank_learn(["0 qid:1 1:0"], 0.001, bad, workdir=str(tmp_path))


def test_classify_count_mismatch_raises(tmp_path):
    truncating = _script(
        tmp_path,
        "trunc.py",
        "#!/usr/bin/env python3\nimport sys\nopen(sys.argv[3], 'w').write('1.0\\n')\n",
    )
    model = tmp_path / "m"
    model.write_text("FAKEMODEL\n")
    with pytest.raises(RuntimeError, match="wrote 1 scores for 2"):
        svmrank.svmrank_classify(
            ["0 qid:1 1:0", "0 qid:1 1:1"], str(model), truncating,
            workdir=str(tmp_path),
        )


def test_rerank_scores_via_binaries(tmp_path, monkeypatch):
    monkeypatch.setenv("SVM_RANK_LEARN", _script(tmp_path, "l.py", FAKE_LEARN))
    monkeypatch.setenv(
        "SVM_RANK_CLASSIFY", _script(tmp_path, "c.py", FAKE_CLASSIFY)
    )
    train = svmrank_lines(_rows([0.1, 0.9]), "1", labels={1: 1})
    out = svmrank.rerank_scores(
        train, {"7": _rows([0.3, 0.8, 0.1])}, c=0.001
    )
    assert [r["score"] for r in out["7"]] == [0.6, 1.6, 0.2]
    assert [r["docid"] for r in out["7"]] == [0, 1, 2]


def test_rerank_scores_no_binaries_no_fallback_inputs():
    with pytest.raises(ValueError, match="SVMrank binaries not found"):
        svmrank.rerank_scores(["0 qid:1 1:0"], {"1": _rows([0.5])})


def test_rerank_scores_linearsvc_fallback(spark):
    """No binaries resolvable -> LinearSVC weights + classify_local, the
    in-cluster path letor_rerank_topk already gates its oracle on."""
    rows = _rows([0.1, 0.9, 0.2, 0.8])
    norm = spark.createDataFrame(
        [{k: v for k, v in r.items() if k != "ext_docid"} for r in rows]
    )
    labels = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 0), (3, 1)], "docid long, rel int"
    )
    out = svmrank.rerank_scores(
        [], {"1": rows}, norm_feats=norm, labels=labels
    )
    scores = {r["docid"]: r["score"] for r in out["1"]}
    # the only varying feature is f1 and labels follow it: high f1 must
    # outrank low f1 under any sane linear fit
    assert scores[1] > scores[0] and scores[3] > scores[2]
