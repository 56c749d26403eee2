"""Per-frame channel derivation (train/factory.py model_channels).

Chip files stack frames channelwise ((T·C, H, W)) and the shipped
multi-temporal configs list T·C band entries, while in-memory datasets
pass per-frame channels directly — the derivation must tell the two
apart, and ``model.num_channels`` must win when it cannot.
"""

from instageo_tpu.configs.config import ConfigDict
from instageo_tpu.train.factory import model_channels


def _cfg(**dl):
    return ConfigDict.wrap({"model": {}, "dataloader": dl})


def test_single_frame_bands_are_per_frame():
    cfg = _cfg(bands=[0, 1, 2, 3, 4, 5], mean=[0.0] * 6, temporal_dim=1)
    assert model_channels(cfg) == 6


def test_stacked_multitemporal_bands_divide_by_frames():
    # The T=3 crop task lists 18 stacked band indices with 6 per-frame
    # normalization stats.
    cfg = _cfg(bands=list(range(18)), mean=[0.0] * 6, temporal_dim=3)
    assert model_channels(cfg) == 6


def test_no_bands_falls_back_to_mean_length():
    cfg = _cfg(bands=None, mean=[0.0] * 4, temporal_dim=1)
    assert model_channels(cfg) == 4


def test_explicit_num_channels_overrides_ambiguous_derivation():
    # Ambiguous: an in-memory per-frame dataset with C=12 and T=2 whose
    # config kept the 6-entry default mean satisfies 12 == 2*6 and would
    # be misread as stacked — model.num_channels disambiguates.
    cfg = ConfigDict.wrap({
        "model": {"num_channels": 12},
        "dataloader": {"bands": list(range(12)), "mean": [0.0] * 6,
                       "temporal_dim": 2},
    })
    assert model_channels(cfg) == 12
