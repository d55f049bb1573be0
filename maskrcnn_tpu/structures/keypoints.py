"""Keypoint structures (host-side numpy).

Reference: maskrcnn_benchmark/structures/keypoint.py:8-188. Keypoints are
[N, K, 3] (x, y, visibility). The device-side heatmap encoding lives in
models/roi_heads/keypoint_head.py (keypoints_to_heat_map equivalent).
"""

import numpy as np

from .boxlist import FLIP_LEFT_RIGHT


class Keypoints:
    def __init__(self, keypoints, size):
        keypoints = np.asarray(keypoints, np.float32)
        num = keypoints.shape[0]
        if num:
            keypoints = keypoints.reshape(num, -1, 3)
        else:
            keypoints = keypoints.reshape(0, 17, 3)
        self.keypoints = keypoints
        self.size = tuple(size)

    def crop(self, box):
        raise NotImplementedError()

    def resize(self, size, *args, **kwargs):
        ratios = tuple(float(s) / float(s_orig) for s, s_orig in zip(size, self.size))
        rw, rh = ratios
        resized = self.keypoints.copy()
        resized[..., 0] *= rw
        resized[..., 1] *= rh
        out = type(self)(resized, size)
        return out

    def transpose(self, method):
        if method != FLIP_LEFT_RIGHT:
            raise NotImplementedError(
                "Only FLIP_LEFT_RIGHT implemented for keypoints"
            )
        flip_inds = type(self).FLIP_INDS
        flipped = self.keypoints[:, flip_inds]
        width = self.size[0]
        TO_REMOVE = 1
        flipped[..., 0] = width - flipped[..., 0] - TO_REMOVE
        # keep COCO convention: invisible points stay at 0
        inds = flipped[..., 2] == 0
        flipped[inds] = 0
        return type(self)(flipped, self.size)

    def __getitem__(self, item):
        return type(self)(self.keypoints[item], self.size)

    def __len__(self):
        return self.keypoints.shape[0]

    def to_array(self):
        return self.keypoints

    def __repr__(self):
        return "{}(num_instances={}, size={})".format(
            type(self).__name__, len(self), self.size
        )


def _create_flip_indices(names, flip_map):
    full_flip_map = dict(flip_map)
    full_flip_map.update({v: k for k, v in flip_map.items()})
    flipped_names = [full_flip_map.get(i, i) for i in names]
    return np.array([names.index(i) for i in flipped_names], np.int64)


class PersonKeypoints(Keypoints):
    NAMES = [
        "nose",
        "left_eye",
        "right_eye",
        "left_ear",
        "right_ear",
        "left_shoulder",
        "right_shoulder",
        "left_elbow",
        "right_elbow",
        "left_wrist",
        "right_wrist",
        "left_hip",
        "right_hip",
        "left_knee",
        "right_knee",
        "left_ankle",
        "right_ankle",
    ]
    FLIP_MAP = {
        "left_eye": "right_eye",
        "left_ear": "right_ear",
        "left_shoulder": "right_shoulder",
        "left_elbow": "right_elbow",
        "left_wrist": "right_wrist",
        "left_hip": "right_hip",
        "left_knee": "right_knee",
        "left_ankle": "right_ankle",
    }


PersonKeypoints.FLIP_INDS = _create_flip_indices(
    PersonKeypoints.NAMES, PersonKeypoints.FLIP_MAP
)


def kp_connections(keypoints):
    return [
        [keypoints.index("left_eye"), keypoints.index("right_eye")],
        [keypoints.index("left_eye"), keypoints.index("nose")],
        [keypoints.index("right_eye"), keypoints.index("nose")],
        [keypoints.index("right_eye"), keypoints.index("right_ear")],
        [keypoints.index("left_eye"), keypoints.index("left_ear")],
        [keypoints.index("right_shoulder"), keypoints.index("right_elbow")],
        [keypoints.index("right_elbow"), keypoints.index("right_wrist")],
        [keypoints.index("left_shoulder"), keypoints.index("left_elbow")],
        [keypoints.index("left_elbow"), keypoints.index("left_wrist")],
        [keypoints.index("right_hip"), keypoints.index("right_knee")],
        [keypoints.index("right_knee"), keypoints.index("right_ankle")],
        [keypoints.index("left_hip"), keypoints.index("left_knee")],
        [keypoints.index("left_knee"), keypoints.index("left_ankle")],
        [keypoints.index("right_shoulder"), keypoints.index("left_shoulder")],
        [keypoints.index("right_hip"), keypoints.index("left_hip")],
    ]


PersonKeypoints.CONNECTIONS = kp_connections(PersonKeypoints.NAMES)
