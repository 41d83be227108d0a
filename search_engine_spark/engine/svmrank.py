"""SVMrank subprocess integration (SURVEY.md §2.11 trainer surface).

The reference trains and classifies by shelling out to the SVMrank binaries:
``svmRankLearn`` at hw5/QryEval/QryEval.java:319-351 (writes the training
feature file, execs ``svm_rank_learn -c <C> <train> <model>``, drains
stdout/stderr, checks the exit code) and ``svmRankClassify`` at :473-498
(execs ``svm_rank_classify <test> <model> <predictions>``, reads one score
per line, ``Double.parseDouble`` with the NaN→0.0 guard at :523-524).

We do exactly that when the binaries exist — resolved ONCE per process from
``SVM_RANK_LEARN`` / ``SVM_RANK_CLASSIFY`` env vars or PATH, the same
resolve-once pattern the video decoder uses for ffmpeg
(pipeline/multimodal.py:290) — and fall back to the in-cluster LinearSVC
trainer (engine/letor.py train_linear_model) + expression classify when they
don't. Training runs on the DRIVER either way: the feature file is ≤100
candidate rows per query by the reference's own cut (QryEval.java:424), so
the subprocess is O(k·queries) — never a distributed bottleneck. The scores
the subprocess produces feed the same rerank sort (desc score, §2.6
tie-break) as the in-cluster path.
"""

from __future__ import annotations

import math
import os
import shutil
import subprocess
import tempfile

_RESOLVED: dict[str, str | None] = {}


def resolve_binary(kind: str) -> str | None:
    """``kind`` in {"learn", "classify"} -> executable path or None.
    Resolved once per process: env override first (SVM_RANK_LEARN /
    SVM_RANK_CLASSIFY), then PATH under the standard names."""
    if kind in _RESOLVED:
        return _RESOLVED[kind]
    env = {"learn": "SVM_RANK_LEARN", "classify": "SVM_RANK_CLASSIFY"}[kind]
    names = {
        "learn": ("svm_rank_learn", "svmRankLearn"),
        "classify": ("svm_rank_classify", "svmRankClassify"),
    }[kind]
    path = os.environ.get(env)
    if not path:
        for n in names:
            path = shutil.which(n)
            if path:
                break
    _RESOLVED[kind] = path or None
    return _RESOLVED[kind]


def _run(cmd: list[str]) -> None:
    """Exec + drain + exit-code check (QryEval.java:330-351 consumes the
    child's stdout/stderr before waitFor so the pipe can't deadlock —
    subprocess.run's capture does the same)."""
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"{os.path.basename(cmd[0])} exited {proc.returncode}: "
            f"{(proc.stderr or proc.stdout)[:500]}"
        )


def svmrank_learn(
    train_lines: list[str], c: float, learn_bin: str, workdir: str | None = None
) -> str:
    """Write the SVMrank training feature file and train; returns the model
    file path (QryEval.java:319-351; ``-c`` is svmRankParamC, default 0.001
    per the reference's parameter file)."""
    wd = workdir or tempfile.mkdtemp(prefix="svmrank_")
    train_path = os.path.join(wd, "train.feats")
    model_path = os.path.join(wd, "svmrank.model")
    with open(train_path, "w") as f:
        f.write("\n".join(train_lines) + "\n")
    _run([learn_bin, "-c", str(c), train_path, model_path])
    return model_path


def svmrank_classify(
    test_lines: list[str],
    model_path: str,
    classify_bin: str,
    workdir: str | None = None,
) -> list[float]:
    """Classify the test feature file against a trained model; one score per
    input line, in order. ``nan`` parses like Java's Double.parseDouble and
    is zeroed (QryEval.java:473-498, NaN guard :523-524)."""
    wd = workdir or tempfile.mkdtemp(prefix="svmrank_")
    test_path = os.path.join(wd, "test.feats")
    pred_path = os.path.join(wd, "predictions")
    with open(test_path, "w") as f:
        f.write("\n".join(test_lines) + "\n")
    _run([classify_bin, test_path, model_path, pred_path])
    with open(pred_path) as f:
        scores = [float(line.strip()) for line in f if line.strip()]
    if len(scores) != len(test_lines):
        raise RuntimeError(
            f"svm_rank_classify wrote {len(scores)} scores for "
            f"{len(test_lines)} rows"
        )
    return [0.0 if math.isnan(s) else s for s in scores]


def rerank_scores(
    train_lines: list[str],
    test_rows_by_qid: dict[str, list[dict]],
    c: float = 0.001,
    norm_feats=None,
    labels=None,
) -> dict[str, list[dict]]:
    """qid -> [{docid, score}] for every test candidate row, via the real
    SVMrank binaries when resolvable, else the LinearSVC fallback.

    ``test_rows_by_qid``: qid -> normalized feature rows (dicts with
    docid/ext_docid + f1..f18, letor.normalize_features_local shape).
    ``norm_feats``/``labels`` (DataFrames) are only consulted by the
    fallback trainer."""
    from search_engine_spark.engine.letor import classify_local, svmrank_lines

    learn = resolve_binary("learn")
    classify = resolve_binary("classify")
    if learn and classify:
        model = svmrank_learn(train_lines, c, learn)
        out: dict[str, list[dict]] = {}
        for qid, rows in test_rows_by_qid.items():
            lines = svmrank_lines(rows, qid)
            scores = svmrank_classify(lines, model, classify)
            out[qid] = [
                {"docid": r["docid"], "score": s} for r, s in zip(rows, scores)
            ]
        return out
    if norm_feats is None or labels is None:
        raise ValueError(
            "SVMrank binaries not found and no LinearSVC fallback inputs "
            "given — set SVM_RANK_LEARN/SVM_RANK_CLASSIFY or pass "
            "norm_feats + labels"
        )
    from search_engine_spark.engine.letor import train_linear_model

    weights = train_linear_model(norm_feats, labels)
    return {
        qid: classify_local(rows, weights)
        for qid, rows in test_rows_by_qid.items()
    }
