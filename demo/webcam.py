#!/usr/bin/env python
"""Webcam demo (reference demo/webcam.py:11-80)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from maskrcnn_tpu.config import cfg
from predictor import COCODemo


def main():
    parser = argparse.ArgumentParser(description="Webcam demo")
    parser.add_argument(
        "--config-file",
        default="configs/e2e_mask_rcnn_R_50_FPN_1x.yaml",
        metavar="FILE",
    )
    parser.add_argument("--confidence-threshold", type=float, default=0.7)
    parser.add_argument("--min-image-size", type=int, default=224)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    demo = COCODemo(
        cfg,
        confidence_threshold=args.confidence_threshold,
        min_image_size=args.min_image_size,
    )

    import cv2

    cam = cv2.VideoCapture(0)
    while True:
        start_time = time.time()
        ret_val, img = cam.read()
        if not ret_val:
            break
        composite = demo.run_on_opencv_image(img)
        print("Time: {:.2f} s / img".format(time.time() - start_time))
        cv2.imshow("COCO detections", composite)
        if cv2.waitKey(1) == 27:
            break  # esc to quit
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
