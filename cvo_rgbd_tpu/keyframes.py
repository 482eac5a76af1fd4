"""Keyframe selection + keyframe-referenced odometry.

The reference defines `function_inner_product` (adaptive_cvo.cpp:
385-439) as a keyframe-selection hook but never wires it into the
shipped mains (SURVEY.md section 3.2).  This module completes the
feature: the normalized cross inner product

    score(a, b) = <f_a, f_b> / sqrt(<f_a, f_a> <f_b, f_b>)

measures overlap between a keyframe and the current frame; when it
drops below `threshold`, the current frame is promoted.  Registering
every frame against the keyframe (rather than the previous frame)
removes per-frame drift accumulation between promotions.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np

from cvo_rgbd_tpu.core.registration import function_inner_product


@functools.lru_cache(maxsize=None)
def _compiled_fip(params):
    return jax.jit(functools.partial(function_inner_product, params))


def keyframe_score(params, key_cloud, cloud):
    """Normalized function inner product in [0, ~1]."""
    fip = _compiled_fip(params)
    cross = fip(key_cloud, cloud)
    aa = fip(key_cloud, key_cloud)
    bb = fip(cloud, cloud)
    return float(cross / np.sqrt(float(aa) * float(bb) + 1e-30))


@dataclasses.dataclass
class KeyframePolicy:
    threshold: float = 0.6    # promote when overlap drops below this
    max_span: int = 30        # force promotion after this many frames


class KeyframeSelector:
    """Tracks the active keyframe; call `update` once per frame."""

    def __init__(self, params, policy: KeyframePolicy | None = None):
        self.params = params
        self.policy = policy or KeyframePolicy()
        self.key_cloud = None
        self.key_index = -1
        self.frames_since = 0

    def update(self, index, cloud):
        """Returns (is_new_keyframe, score)."""
        if self.key_cloud is None:
            self.key_cloud = cloud
            self.key_index = index
            self.frames_since = 0
            return True, 1.0
        score = keyframe_score(self.params, self.key_cloud, cloud)
        self.frames_since += 1
        if (
            score < self.policy.threshold
            or self.frames_since >= self.policy.max_span
        ):
            self.key_cloud = cloud
            self.key_index = index
            self.frames_since = 0
            return True, score
        return False, score
