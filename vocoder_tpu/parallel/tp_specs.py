"""Shared tensor-parallel PartitionSpec builders for the HiFiGAN-skeleton
generators (models/hifigan.py, models/bigvgan.py — same upsample stack, same
sharding scheme; see either model's ``param_specs`` docstring for the
row/column-parallel rationale).

All builders gate on ``min_channels`` (the 128-lane tile): stages narrower
than one full lane tile per device replicate — they are the time-folded
lane-dense region, where a model shard would split folded lanes.
"""

from __future__ import annotations

from jax.sharding import PartitionSpec as P

R = P()


def rep_wn() -> dict:
    """Fully replicated weight-normed conv {v, g, b}."""
    return {"v": R, "g": R, "b": R}


def col_conv(c_out: int, min_channels: int) -> dict:
    """Column-parallel weight-normed conv1d (shard O; g is (1,1,O))."""
    if c_out < min_channels:
        return rep_wn()
    return {"v": P(None, None, "model"), "g": P(None, None, "model"), "b": P("model")}


def row_conv(c_in: int, c_out: int, min_channels: int) -> dict:
    """Row-parallel weight-normed conv1d (shard I).

    g (1,1,O) stays replicated: sharding it on O while v shards I would
    two-axis-shard the materialised weight v * g/||v||.
    """
    if c_in < min_channels:
        return rep_wn()
    return {
        "v": P(None, "model", None),
        "g": R,
        "b": P("model") if c_out >= min_channels else R,
    }


def row_up(c_in: int, c_out: int, min_channels: int) -> dict:
    """Row-parallel weight-normed conv_transpose1d (g is (1,I,1))."""
    if c_in < min_channels:
        return rep_wn()
    return {
        "v": P(None, "model", None),
        "g": P(None, "model", None),
        "b": P("model") if c_out >= min_channels else R,
    }


def noise_conv(c_out: int, min_channels: int) -> dict:
    """Plain conv {w, b} from the 1-channel f0 template: column-parallel."""
    if c_out < min_channels:
        return {"w": R, "b": R}
    return {"w": P(None, None, "model"), "b": P("model")}
