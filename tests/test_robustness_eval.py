"""tools/robustness_eval.py aggregation (reference tools/robustness_eval.py:
P / mPC / rPC corruption-benchmark summary)."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "robustness_eval",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "robustness_eval.py"),
)
robustness_eval = importlib.util.module_from_spec(spec)
spec.loader.exec_module(robustness_eval)


def test_aggregate_p_mpc_rpc():
    report = {
        "clean": {"bbox_mAP": 0.8},
        "fog_s1": {"bbox_mAP": 0.6},
        "fog_s3": {"bbox_mAP": 0.4},
        "snow_s1": {"bbox_mAP": 0.5},
    }
    out = robustness_eval.aggregate(report)
    assert out["P"] == 0.8
    # fog mean 0.5, snow 0.5 -> mPC 0.5; rPC 0.625
    assert abs(out["mPC"] - 0.5) < 1e-12
    assert abs(out["rPC"] - 0.625) < 1e-12
    assert out["per_corruption"] == {"fog": 0.5, "snow": 0.5}


def test_aggregate_missing_clean():
    import pytest

    with pytest.raises(KeyError):
        robustness_eval.aggregate({"fog_s1": {"bbox_mAP": 0.6}})
