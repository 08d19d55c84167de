"""Online keyframe selection (host-side control flow).

Behavioural re-implementation of the reference's KeyframeBuffer /
SimpleBuffer (dvmvs/keyframe_buffer.py:8-129). This logic is inherently
sequential and data-dependent, so it stays on the host; the device only ever
sees the selected (reference, measurements) frame sets with static shapes.

Response codes (KeyframeBuffer.try_new_keyframe):
  0  first frame accepted (no prediction yet)
  1  keyframe accepted — run a prediction
  2  pose too close to the last keyframe — skip
  3  tracking lost (>30 consecutive invalid poses) — buffer cleared,
     callers must reset recurrent state
  4  still lost (buffer already empty)
  5  pose missing but not yet lost
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional, Tuple

import numpy as np

from dvmvs_tpu.ops.geometry import is_pose_available_np, pose_distance_np

TRACKING_LOST_LIMIT = 30


class KeyframeBuffer:
    def __init__(
        self,
        buffer_size: int,
        keyframe_pose_distance: float,
        optimal_t_score: float,
        optimal_R_score: float,
        store_return_indices: bool = False,
    ):
        self.buffer: deque = deque([], maxlen=buffer_size)
        self.keyframe_pose_distance = keyframe_pose_distance
        self.optimal_t_score = optimal_t_score
        self.optimal_R_score = optimal_R_score
        self._tracking_lost_counter = 0
        self._store_return_indices = store_return_indices

    def calculate_penalty(self, t_score: float, R_score: float) -> float:
        degree = 2.0
        R_penalty = np.abs(R_score - self.optimal_R_score) ** degree
        t_diff = t_score - self.optimal_t_score
        if t_diff < 0.0:
            t_penalty = 5.0 * (np.abs(t_diff) ** degree)
        else:
            t_penalty = np.abs(t_diff) ** degree
        return R_penalty + t_penalty

    def try_new_keyframe(self, pose: np.ndarray, image, index: Optional[int] = None) -> int:
        if self._store_return_indices and index is None:
            raise ValueError("store_return_indices=True requires an index")

        if not is_pose_available_np(pose):
            self._tracking_lost_counter += 1
            if self._tracking_lost_counter > TRACKING_LOST_LIMIT:
                if len(self.buffer) > 0:
                    self.buffer.clear()
                    return 3
                return 4
            return 5

        self._tracking_lost_counter = 0
        entry = (pose, image, index) if self._store_return_indices else (pose, image)
        if len(self.buffer) == 0:
            self.buffer.append(entry)
            return 0
        last_pose = self.buffer[-1][0]
        combined, _, _ = pose_distance_np(pose, last_pose)
        if combined >= self.keyframe_pose_distance:
            self.buffer.append(entry)
            return 1
        return 2

    def get_best_measurement_frames(self, n_requested: int) -> List[Tuple]:
        frames = list(self.buffer)
        reference_pose = frames[-1][0]
        n = min(n_requested, len(frames) - 1)

        penalties = []
        for i in range(len(frames) - 1):
            _, R_measure, t_measure = pose_distance_np(reference_pose, frames[i][0])
            penalties.append(self.calculate_penalty(t_measure, R_measure))
        indices = np.argpartition(penalties, n - 1)[:n]
        return [frames[i] for i in indices]


class SimpleBuffer:
    """Fixed-stride buffer used for the n_skip simulation mode
    (reference: dvmvs/keyframe_buffer.py:91-129)."""

    def __init__(self, buffer_size: int, store_return_indices: bool = False):
        self.buffer: deque = deque([], maxlen=buffer_size + 1)
        self._tracking_lost_counter = 0
        self._store_return_indices = store_return_indices

    def try_new_keyframe(self, pose: np.ndarray, image, index: Optional[int] = None) -> int:
        if self._store_return_indices and index is None:
            raise ValueError("store_return_indices=True requires an index")

        if not is_pose_available_np(pose):
            self._tracking_lost_counter += 1
            if self._tracking_lost_counter > TRACKING_LOST_LIMIT:
                if len(self.buffer) > 0:
                    self.buffer.clear()
                    return 2
                return 3
            return 4

        self._tracking_lost_counter = 0
        entry = (pose, image, index) if self._store_return_indices else (pose, image)
        self.buffer.append(entry)
        return 0 if len(self.buffer) == 1 else 1

    def get_measurement_frames(self) -> List[Tuple]:
        return list(self.buffer)[:-1]
