"""PipelineConfig loading — reference-style ``models:`` spec validation.

The reference's YAML admits ``engine: wapiti|delft`` per model
(``DatacatConfiguration.java:38-55``, ``grobid-datacat.yaml:6-30``); this
implementation covers the wapiti family only (SURVEY §7.4), so a config
requesting ``delft`` must fail loudly at load time.
"""

from __future__ import annotations

import pytest

from datacat_ray.config import PipelineConfig, validate_model_specs


def test_wapiti_model_spec_accepted():
    cfg = PipelineConfig.from_dict(
        {
            "models": [
                {
                    "name": "datacat-segmenter",
                    "engine": "wapiti",
                    "wapiti": {"epsilon": 1e-7, "window": 50},
                },
                # engine omitted defaults to wapiti (reference default)
                {"name": "datacat-body-segmentation"},
            ]
        }
    )
    assert len(cfg.models) == 2


def test_delft_engine_rejected():
    with pytest.raises(ValueError, match="unsupported .wapiti-family only"):
        PipelineConfig.from_dict(
            {"models": [{"name": "datacat-segmenter", "engine": "delft"}]}
        )


def test_validate_model_specs_names_offending_model():
    with pytest.raises(ValueError, match="datacat-body-segmentation"):
        validate_model_specs(
            [{"name": "datacat-body-segmentation", "engine": "delft"}]
        )
