"""Just Dance video scoring: extract per-frame poses from a teacher and a
student video, align the sequences by pose similarity, and render a
side-by-side scored comparison.

Port of reference ``projects/just_dance/process_video.py`` over this
framework's APIs (``Pose2DInferencer`` for per-frame top-down inference,
``FastVisualizer`` for the skeleton overlay). The reference's gradio app
is replaced by the CLI entry below (gradio is not in this image).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import cv2
import numpy as np

try:
    from .calculate_similarity import calculate_similarity, select_piece_from_similarity
    from .utils import blend_images, convert_video_fps, get_smoothed_kpt, resize_image_to_fixed_height
except ImportError:  # executed as a script
    from calculate_similarity import calculate_similarity, select_piece_from_similarity
    from utils import blend_images, convert_video_fps, get_smoothed_kpt, resize_image_to_fixed_height

model_cfg = dict(
    human=dict(model="rtmpose-t_8xb256-420e_aic-coco-256x192"),
    bear=dict(model="rtmpose-l_8xb256-420e_humanart-256x192"),
)


class VideoProcessor:
    """Pose extraction + alignment + rendering for two dance videos."""

    def __init__(self):
        self.category = "human"

    def _set_category(self, category: str):
        assert category in model_cfg
        self.category = category

    @property
    def pose_estimator(self):
        from probpose_code_tpu.apis.inferencers import Pose2DInferencer

        if not hasattr(self, "_pose_estimator"):
            self._pose_estimator = {}
        if self.category not in self._pose_estimator:
            self._pose_estimator[self.category] = Pose2DInferencer(**model_cfg[self.category])
        return self._pose_estimator[self.category]

    @property
    def visualizer(self):
        from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
        from probpose_code_tpu.visualization import FastVisualizer

        if not hasattr(self, "_visualizer"):
            self._visualizer = FastVisualizer(parse_pose_metainfo({"dataset_name": "coco"}))
        return self._visualizer

    def get_keypoints_from_frame(self, image: np.ndarray) -> np.ndarray:
        """(1, 17, 3) keypoints of the most confident person (zeros when
        nobody is found — reference :75-103)."""
        results = list(self.pose_estimator(image))
        preds = [p for r in results for p in r.get("predictions", [])]
        if not preds:
            return np.zeros((1, 17, 3), dtype=np.float32)
        inst = preds[0].pred_instances
        if len(inst.keypoints) == 0 or float(np.max(inst.get("bbox_scores", np.ones(1)))) < 0.2:
            return np.zeros((1, 17, 3), dtype=np.float32)
        best = int(np.argmax(inst.get("bbox_scores", inst.keypoint_scores.mean(-1))))
        return np.concatenate(
            [inst.keypoints[best : best + 1], inst.keypoint_scores[best : best + 1, :, None]], axis=-1
        ).astype(np.float32)

    def get_keypoints_from_video(self, video: str) -> np.ndarray:
        """(T, 17, 3) per-frame keypoints, cached next to the video."""
        video_fname = video.rsplit(".", 1)[0]
        cache = f"{video_fname}_kpts.npy"
        if os.path.exists(cache):
            return np.load(cache)
        cap = cv2.VideoCapture(video)
        fps = cap.get(cv2.CAP_PROP_FPS)
        if abs(fps - 30) > 0.1:
            cap.release()
            cap = cv2.VideoCapture(convert_video_fps(video))
        self._set_category("bear" if os.path.basename(video_fname).startswith("bear") else "human")
        kpts = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            kpts.append(self.get_keypoints_from_frame(frame))
        cap.release()
        keypoints = np.concatenate(kpts) if kpts else np.zeros((0, 17, 3), np.float32)
        np.save(cache, keypoints)
        return keypoints

    def run(self, tch_video: str, stu_video: str, output_file: Optional[str] = None) -> str:
        tch_kpts = self.get_keypoints_from_video(tch_video)
        stu_kpts = self.get_keypoints_from_video(stu_video)
        similarity = calculate_similarity(tch_kpts, stu_kpts)
        piece_info = select_piece_from_similarity(similarity)
        if output_file is None:
            tch = os.path.basename(tch_video).rsplit(".", 1)[0]
            stu = os.path.basename(stu_video).rsplit(".", 1)[0]
            output_file = os.path.join(tempfile.mkdtemp(), f"{tch}-{stu}.mp4")
        return self.generate_output_video(tch_video, stu_video, output_file, tch_kpts, stu_kpts, piece_info)

    def generate_output_video(self, tch_video, stu_video, output_file, tch_kpts, stu_kpts, piece_info) -> str:
        """Blended skeleton panel + running score between the two videos
        (reference :155-226)."""
        tch_cap = cv2.VideoCapture(tch_video)
        stu_cap = cv2.VideoCapture(stu_video)
        tch_cap.set(cv2.CAP_PROP_POS_FRAMES, piece_info["tch_start"])
        stu_cap.set(cv2.CAP_PROP_POS_FRAMES, piece_info["stu_start"])

        score = last_vis = 0.0
        writer = None
        for i in range(piece_info["length"]):
            ok1, tch_frame = tch_cap.read()
            ok2, stu_frame = stu_cap.read()
            if not (ok1 and ok2):
                break
            tch_frame = resize_image_to_fixed_height(tch_frame[:, :, ::-1], 300)
            stu_frame = resize_image_to_fixed_height(stu_frame[:, :, ::-1], 300)

            stu_kpt = get_smoothed_kpt(stu_kpts, piece_info["stu_start"] + i, 5)
            tch_kpt = get_smoothed_kpt(tch_kpts, piece_info["tch_start"] + i, 5)
            stu_kpt[..., 1] += 300 - 256
            tch_kpt[..., 0] += 256 - 192
            tch_kpt[..., 1] += 300 - 256

            class _Inst:
                pass

            stu_img = np.zeros((300, 256, 3), np.uint8)
            tch_img = np.zeros((300, 256, 3), np.uint8)
            for img, kpt in ((stu_img, stu_kpt), (tch_img, tch_kpt)):
                inst = _Inst()
                inst.keypoints = kpt[None, :, :2]
                inst.keypoint_scores = kpt[None, :, 2]
                self.visualizer.draw_pose(img, inst)
            out_img = blend_images(stu_img, tch_img, blend_ratios=(1, 0.3))

            frame_score = float(piece_info["similarity"][i])
            score += frame_score * 1000
            if score - last_vis > 1500:
                last_vis = score
            cv2.putText(out_img, "score:", (40, 30), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
            cv2.putText(
                out_img, f"{int(last_vis)}", (105, 32), cv2.FONT_HERSHEY_SIMPLEX,
                max(0.4, frame_score), (255, 255, 255), 2,
            )

            frame = np.hstack((stu_frame, out_img, tch_frame))
            if writer is None:
                writer = cv2.VideoWriter(
                    output_file, cv2.VideoWriter_fourcc(*"mp4v"), 30, (frame.shape[1], frame.shape[0])
                )
            writer.write(frame[:, :, ::-1])
        if writer is not None:
            writer.release()
        return output_file


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    parser.add_argument("teacher_video")
    parser.add_argument("student_video")
    parser.add_argument("--output-file", default=None)
    args = parser.parse_args()
    print(VideoProcessor().run(args.teacher_video, args.student_video, args.output_file))
