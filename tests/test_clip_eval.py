"""CLIP evaluator metric-core tests (reference
evaluation/CLIP/evaluation_amortized.py:63-114) — weights-free: synthetic
normalized features exercise similarity + R-precision exactly."""

import importlib.util
import os

import numpy as np


def _load_eval():
    path = os.path.join(os.path.dirname(__file__), "..", "evaluation",
                        "CLIP", "evaluation_amortized.py")
    spec = importlib.util.spec_from_file_location("clip_eval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_metrics_perfect_alignment():
    ev = _load_eval()
    rng = np.random.default_rng(0)
    T = _norm(rng.standard_normal((5, 16)).astype(np.float32))
    feats = {i: np.repeat(T[i][None], 3, axis=0) for i in range(5)}
    sims, recalls = ev.compute_metrics(T, feats)
    for i in range(5):
        assert abs(sims[i] - 1.0) < 1e-5
        assert recalls[i] == 1.0


def test_metrics_misassigned_frames_drop_recall():
    ev = _load_eval()
    rng = np.random.default_rng(1)
    T = _norm(rng.standard_normal((4, 16)).astype(np.float32))
    feats = {
        0: np.stack([T[0], T[0], T[1], T[1]]),   # half the frames match 1
        1: np.repeat(T[1][None], 4, axis=0),
    }
    sims, recalls = ev.compute_metrics(T, feats)
    assert recalls[0] == 0.5
    assert recalls[1] == 1.0
    # similarity for prompt 0 < prompt 1 (half the frames are off-prompt)
    assert sims[0] < sims[1]


def test_metrics_recall_is_over_full_prompt_set():
    """R-precision ranks against ALL prompts (recall@1 over the set), so a
    frame closest to a DIFFERENT prompt counts as a miss even when its
    similarity to its own prompt is positive."""
    ev = _load_eval()
    a = np.array([1.0, 0.0], np.float32)
    b = np.array([np.cos(0.1), np.sin(0.1)], np.float32)  # close to a
    T = np.stack([a, b])
    # frame for prompt 0 sits exactly on b -> argmax = 1 -> miss
    feats = {0: b[None]}
    sims, recalls = ev.compute_metrics(T, feats)
    assert recalls[0] == 0.0
    assert sims[0] > 0.9  # yet cosine to its own prompt is high


def test_evaluator_cli_end_to_end_random_init(tmp_path):
    """Drive the full evaluator CLI (walk dirs -> preprocess -> encode ->
    metrics -> similarity.txt/recall.txt) with --random_init: validates
    every pipeline stage that doesn't require real CLIP weights."""
    import subprocess
    import sys as _sys
    from PIL import Image
    rng = np.random.default_rng(0)
    for prompt in ("a_red_apple", "a_blue_car"):
        d = tmp_path / prompt
        d.mkdir()
        for i in range(3):
            arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "evaluation", "CLIP",
        "evaluation_amortized.py")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [_sys.executable, script, "--result_dir", str(tmp_path),
         "--random_init"], capture_output=True, text=True, env=env,
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    sim_lines = (tmp_path / "similarity.txt").read_text().strip().split("\n")
    rec_lines = (tmp_path / "recall.txt").read_text().strip().split("\n")
    # 2 prompts + the average row (reference's "avgerage" spelling)
    assert len(sim_lines) == 3 and sim_lines[-1].startswith("avgerage:")
    assert len(rec_lines) == 3 and rec_lines[-1].startswith("avgerage:")
    for line in sim_lines:
        v = float(line.split(": ")[1])
        assert -1.0 <= v <= 1.0
