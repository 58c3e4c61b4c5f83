"""ML toolbox: feature extraction, dataset generation, JAX/Flax examples.

Capability port of the reference's ``tensorflow/`` tree (SURVEY.md §2.11)
and ``source/plugin/tfplugins.cpp``: per-particle stencil feature vectors
(extractFeature{Vel,Phi,Geo}), connected-region analysis
(getRegions/getRegionalCounts/extendRegion), a mantaGen-style dataset
generator driving the fused smoke/FLIP models, and JAX/Flax model examples
(tiled super-resolution, ML-FLIP splash classification) replacing the
TensorFlow examples. The sim being JAX end-to-end means dataset generation,
feature extraction, and training all run in the same framework with no
format hops (the reference needed .uni <-> npz converters; ours are pytrees
already).
"""

from .features import (extract_feature_vel, extract_feature_phi,
                       extract_feature_geo, get_regions,
                       get_regional_counts, extend_region)
from .datagen import generate_smoke_dataset, generate_flip_dataset
