"""Evaluation: FID + Inception Score with a JAX InceptionV3 extractor."""

from dmme_tpu.eval.fid import (
    FeatureStats,
    FrechetInceptionDistance,
    frechet_distance,
)
from dmme_tpu.eval.inception_score import InceptionScore
from dmme_tpu.eval.inception import InceptionV3, make_feature_fn, preprocess

__all__ = [
    "FeatureStats",
    "FrechetInceptionDistance",
    "frechet_distance",
    "InceptionScore",
    "InceptionV3",
    "make_feature_fn",
    "preprocess",
]
