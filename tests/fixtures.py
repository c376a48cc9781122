"""Synthetic dataset fixtures (no real data on this machine — SURVEY.md
section 9: tests must synthesize images/annotations)."""

import json
import os

import numpy as np

K = 17


def synth_pose(rng, cx, cy, size=60.0):
    """A plausible 17-joint pose around (cx, cy)."""
    offsets = np.array([
        [0, -0.40], [-0.05, -0.45], [0.05, -0.45], [-0.12, -0.42],
        [0.12, -0.42], [-0.20, -0.25], [0.20, -0.25], [-0.28, -0.05],
        [0.28, -0.05], [-0.30, 0.12], [0.30, 0.12], [-0.12, 0.05],
        [0.12, 0.05], [-0.14, 0.30], [0.14, 0.30], [-0.15, 0.48],
        [0.15, 0.48]])
    jitter = rng.uniform(-0.02, 0.02, offsets.shape)
    return np.array([cx, cy]) + (offsets + jitter) * size


def draw_person(img, joints, radius=2):
    """Distinct bright blobs at joints so images carry real signal."""
    h, w = img.shape[:2]
    for j, (x, y) in enumerate(joints):
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < w and 0 <= yi < h:
            color = np.array([(j * 37) % 256, (j * 91) % 256, 255 - (j * 53) % 256])
            y0, y1 = max(0, yi - radius), min(h, yi + radius + 1)
            x0, x1 = max(0, xi - radius), min(w, xi + radius + 1)
            img[y0:y1, x0:x1] = color


def save_image(path, img):
    try:
        import cv2

        cv2.imwrite(path, img[:, :, ::-1])  # RGB -> BGR
    except ImportError:  # pragma: no cover
        from PIL import Image

        Image.fromarray(img).save(path)


def make_coco_fixture(root, n_images=4, persons=2, img_hw=(240, 320), seed=0):
    """Write a mini COCO keypoint dataset; returns (root, ann_file, det_file)."""
    rng = np.random.default_rng(seed)
    root = str(root)
    img_dir = os.path.join(root, "images", "val2017")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations, detections = [], [], []
    ann_id = 1
    h, w = img_hw
    for img_id in range(1, n_images + 1):
        img = (rng.uniform(0, 60, (h, w, 3))).astype(np.uint8)
        for p in range(persons):
            cx = 80 + 150 * p + rng.uniform(-10, 10)
            cy = 120 + rng.uniform(-20, 20)
            joints = synth_pose(rng, cx, cy)
            draw_person(img, joints)
            xs, ys = joints[:, 0], joints[:, 1]
            bbox = [float(xs.min() - 8), float(ys.min() - 8),
                    float(xs.max() - xs.min() + 16),
                    float(ys.max() - ys.min() + 16)]
            kp = []
            for (x, y) in joints:
                kp += [float(x), float(y), 2]
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kp, "num_keypoints": K,
                "bbox": bbox, "area": bbox[2] * bbox[3], "iscrowd": 0,
            })
            detections.append({
                "image_id": img_id, "category_id": 1,
                "bbox": [b + float(rng.uniform(-3, 3)) for b in bbox[:2]]
                        + bbox[2:],
                "score": float(rng.uniform(0.8, 0.99)),
            })
            ann_id += 1
        fname = f"{img_id:012d}.png"
        save_image(os.path.join(img_dir, fname), img)
        images.append({"id": img_id, "file_name": fname,
                       "width": w, "height": h})

    ann_file = os.path.join(ann_dir, "person_keypoints_val2017.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    det_file = os.path.join(root, "detections.json")
    with open(det_file, "w") as f:
        json.dump(detections, f)
    return root, ann_file, det_file


def make_posetrack_fixture(root, n_videos=2, n_frames=4, persons=2,
                           img_hw=(240, 320), seed=0, motion=6.0):
    """Mini PoseTrack: persons translate smoothly between frames."""
    rng = np.random.default_rng(seed)
    root = str(root)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    img_id, ann_id = 1, 1
    h, w = img_hw
    for vid in range(n_videos):
        vdir = os.path.join(root, "images", f"val/{vid:06d}")
        os.makedirs(vdir, exist_ok=True)
        starts = [(70 + 150 * p, 120) for p in range(persons)]
        vels = [(rng.uniform(-motion, motion), rng.uniform(-motion, motion))
                for _ in range(persons)]
        shapes = [synth_pose(rng, 0, 0) for _ in range(persons)]
        for t in range(n_frames):
            img = (rng.uniform(0, 60, (h, w, 3))).astype(np.uint8)
            fname = f"images/val/{vid:06d}/{t:06d}.png"
            for p in range(persons):
                cx = starts[p][0] + vels[p][0] * t
                cy = starts[p][1] + vels[p][1] * t
                joints = shapes[p] + np.array([cx, cy])
                draw_person(img, joints)
                xs, ys = joints[:, 0], joints[:, 1]
                bbox = [float(xs.min() - 8), float(ys.min() - 8),
                        float(xs.max() - xs.min() + 16),
                        float(ys.max() - ys.min() + 16)]
                kp = []
                for (x, y) in joints:
                    kp += [float(x), float(y), 2]
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "track_id": vid * 100 + p,
                    "keypoints": kp, "num_keypoints": K,
                    "bbox": bbox, "area": bbox[2] * bbox[3], "iscrowd": 0,
                    "bbox_head": [bbox[0], bbox[1], bbox[2] * 0.4,
                                  bbox[3] * 0.25],
                })
                ann_id += 1
            save_image(os.path.join(root, fname), img)
            images.append({"id": img_id, "file_name": fname,
                           "width": w, "height": h,
                           "vid_id": f"{vid:06d}", "frame_id": t})
            img_id += 1

    ann_file = os.path.join(ann_dir, "val.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return root, ann_file
