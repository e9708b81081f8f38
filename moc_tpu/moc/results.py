"""Result files byte-compatible with the reference's schemas.

Writers for the per-episode JSONs and the fold-aggregating ``summary_{shot}.csv``
(``/root/reference/main_moc.py:53-127,590-642``): same file names, same keys,
same mean-row aggregation, including the fallbacks for zero-shot-less and
ablation result layouts.
"""

from __future__ import annotations

import json
import os
from glob import glob

import numpy as np
import pandas as pd

from moc_tpu.moc.episode import EpisodeResult


def episode_result_path(result_dir: str, shot: int, fold: int) -> str:
    return os.path.join(result_dir, f"best_results_shot_{shot}_fold_{fold}.json")


def write_episode_result(result_dir: str, shot: int, fold: int, result: EpisodeResult) -> str:
    os.makedirs(result_dir, exist_ok=True)
    payload = result.to_dict()
    payload["best_model_path"] = os.path.join(
        result_dir, f"best_model_shot_{shot}_fold_{fold}.msgpack"
    )
    path = episode_result_path(result_dir, shot, fold)
    with open(path, "w") as f:
        json.dump(payload, f, indent=4)
    return path


def write_zeroshot_result(result_dir: str, shot: int, fold: int,
                          zs_train: dict, zs_val: dict, zs_test: dict) -> str:
    os.makedirs(result_dir, exist_ok=True)
    path = os.path.join(result_dir, f"zs_results_shot_{shot}_fold_{fold}.json")
    with open(path, "w") as f:
        json.dump({"zs_train": zs_train, "zs_val": zs_val, "zs_test": zs_test}, f, indent=4)
    return path


def write_ablation_result(result_dir: str, ablation: str, shot: int, fold: int,
                          metrics: dict) -> str:
    os.makedirs(result_dir, exist_ok=True)
    path = os.path.join(
        result_dir, f"ablation_results_{ablation}_shot_{shot}_fold_{fold}.json"
    )
    with open(path, "w") as f:
        json.dump(metrics, f, indent=4)
    return path


def summarize(summary_dir: str, shots=(1, 2, 4, 8), folds=(0, 1, 2, 3, 4)) -> dict[int, str]:
    """Aggregate per-fold JSONs into ``summary_{shot}.csv`` with a mean row.

    Tries the three reference layouts in order (full / no-zero-shot /
    ablation), like ``main_moc.py:58-125``.
    """
    written: dict[int, str] = {}
    for shot in shots:
        shot_dir = os.path.join(summary_dir, f"{shot}_shot")
        out_path = os.path.join(summary_dir, f"summary_{shot}.csv")
        # remove any previous CSV BEFORE attempting, like the reference
        # (main_moc.py:60-62): a failed shot must not leave a stale summary
        # masquerading as current results
        if os.path.exists(out_path):
            os.remove(out_path)
        frame = _summarize_shot(shot_dir, shot, list(folds))
        if frame is None:
            print(f"shot {shot} summary failed")
            continue
        frame.to_csv(out_path, index=False)
        written[shot] = out_path
    return written


def policy_json_to_csv(json_path: str, out_csv: str) -> pd.DataFrame:
    """Reshape a policy-analysis JSON ``{method: {dataset: value}}`` into a
    method × dataset CSV (ref ``utils/result2csv.py``)."""
    with open(json_path) as f:
        payload = json.load(f)
    methods = sorted(payload)
    datasets = sorted({d for m in payload.values() for d in m})
    frame = pd.DataFrame(
        [[payload[m].get(d) for d in datasets] for m in methods],
        index=methods, columns=datasets,
    )
    frame.index.name = "method"
    frame.to_csv(out_csv)
    return frame


def _summarize_shot(shot_dir: str, shot: int, folds: list) -> pd.DataFrame | None:
    def load(fold):
        with open(os.path.join(shot_dir, f"best_results_shot_{shot}_fold_{fold}.json")) as f:
            return json.load(f)

    try:
        rows = [load(f) for f in folds]
        cols = {
            "test_auc": [r["test_at_best_val"] for r in rows],
            "zs_test_auc": [r["zero_shot_test"]["auc"] for r in rows],
            "test_acc": [r["test_acc_at_best_val"] for r in rows],
            "zs_test_acc": [r["zero_shot_test"]["acc"] for r in rows],
        }
    except (FileNotFoundError, KeyError, TypeError,
            json.JSONDecodeError):
        try:
            rows = [load(f) for f in folds]
            cols = {
                "test_auc": [r["test_at_best_val"] for r in rows],
                "test_acc": [r["test_acc_at_best_val"] for r in rows],
            }
        except (FileNotFoundError, KeyError, TypeError,
                json.JSONDecodeError):
            try:
                rows = []
                for fold in folds:
                    matches = glob(os.path.join(shot_dir, f"*_shot_{shot}_fold_{fold}.json"))
                    with open(matches[0]) as f:
                        rows.append(json.load(f))
                cols = {
                    "auc": [r["auc"] for r in rows],
                    "acc": [r["acc"] for r in rows],
                }
            except (FileNotFoundError, IndexError, KeyError,
                    json.JSONDecodeError):
                return None
    frame = {"fold": list(folds) + ["mean"]}
    for key, vals in cols.items():
        frame[key] = vals + [float(np.mean(vals))]
    return pd.DataFrame(frame)
