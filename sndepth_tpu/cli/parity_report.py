"""CLI: one-command real-data metric parity report (VERDICT r3 #7).

Wraps the `docs/PARITY.md` recipe: given a directory of released
reference checkpoints and a directory of datasets, convert every family
found, run the matching eval CLI, and emit ONE metric table (stdout
markdown + `report.json`). Families whose checkpoint or data is missing
are reported as skipped — so the command runs today (everything skipped)
and produces the full parity table the day KITTI/NYU data appears.

Expected layout (same names as docs/PARITY.md):

    <checkpoints>/rigid_depth_*.pth + rigid_pose_*.pth   GeoNet
    <checkpoints>/nyu.pt                                 NNET normals
    <checkpoints>/best.pt                                MotionFusionNet
    <data>/kitti_eigen_gt.npz + eigen_test_files.txt     depth eval
    <data>/nyu_normals/                                  normals eval
    <data>/kitti_motion/                                 motion eval

Reference metric sources: `models/test_disp.py:129-148` (depth),
`utils/utils_coders.py:73-84` (normals), `evaluate.py:12-22` (mIoU).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil


def _convert(kind: str, out_dir: str, **kw) -> str:
    from sndepth_tpu.cli import convert_weights
    out = os.path.join(out_dir, "converted", kind)
    # Cache key: source checkpoint paths + mtimes. A partially written
    # directory from a crashed run, or an updated reference .pth, must
    # not silently reuse stale converted params (ADVICE r4) — convert
    # into a temp dir and atomically rename on success.
    srcs = sorted(str(v) for v in kw.values())
    stamp = json.dumps([[s, os.path.getmtime(s)] for s in srcs
                        if os.path.exists(s)])
    stamp_file = out + ".src.json"
    fresh = (os.path.isdir(out) and os.path.exists(stamp_file)
             and open(stamp_file).read() == stamp)
    if not fresh:
        tmp = out + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        argv = [kind]
        for k, v in kw.items():
            argv += [f"--{k}", v]
        argv += ["--out", tmp]
        convert_weights.main(argv)
        if os.path.isdir(out):
            shutil.rmtree(out)
        os.replace(tmp, out)
        with open(stamp_file, "w") as f:
            f.write(stamp)
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="one-command parity report")
    p.add_argument("--checkpoints_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--out_dir", default="outputs/parity_report")
    p.add_argument("--img_height", default=128, type=int)
    p.add_argument("--img_width", default=416, type=int)
    p.add_argument("--nyu_height", default=480, type=int)
    p.add_argument("--nyu_width", default=640, type=int)
    args = p.parse_args(argv)

    ck, dd = args.checkpoints_dir, args.data_dir
    os.makedirs(args.out_dir, exist_ok=True)
    report: dict = {}
    skipped: dict = {}

    def have(*paths):
        missing = [q for q in paths if not (
            os.path.exists(q) or glob.glob(q))]
        return missing

    # --- GeoNet depth (KITTI Eigen) ------------------------------------
    depth_ck = sorted(glob.glob(os.path.join(ck, "rigid_depth_*.pth")))
    pose_ck = sorted(glob.glob(os.path.join(ck, "rigid_pose_*.pth")))
    gt_file = os.path.join(dd, "kitti_eigen_gt.npz")
    img_list = os.path.join(dd, "eigen_test_files.txt")
    missing = ([] if depth_ck and pose_ck else ["rigid_depth/pose .pth"]) \
        + have(gt_file, img_list)
    if not missing:
        from sndepth_tpu.cli import evaluate_depth
        conv = _convert("geonet", args.out_dir, depth=depth_ck[-1],
                        pose=pose_ck[-1])
        mj = os.path.join(args.out_dir, "depth_metrics.json")
        evaluate_depth.main([
            "--gt_file", gt_file, "--img_list", img_list,
            "--ckpt_dir", conv, "--metrics_json", mj,
            "--img_height", str(args.img_height),
            "--img_width", str(args.img_width)])
        report["kitti_eigen_depth"] = json.load(open(mj))
    else:
        skipped["kitti_eigen_depth"] = missing

    # --- NNET normals (NYUv2) ------------------------------------------
    nyu_ck = os.path.join(ck, "nyu.pt")
    nyu_data = os.path.join(dd, "nyu_normals")
    missing = have(nyu_ck, nyu_data)
    if not missing:
        from sndepth_tpu.cli import evaluate_normals
        conv = _convert("nnet", args.out_dir, ckpt=nyu_ck)
        mj = os.path.join(args.out_dir, "normal_metrics.json")
        evaluate_normals.main([
            "--data_dir", nyu_data, "--split", "test",
            "--ckpt_dir", conv, "--metrics_json", mj,
            "--img_height", str(args.nyu_height),
            "--img_width", str(args.nyu_width),
            "--log_file", os.path.join(args.out_dir, "normal_eval.txt")])
        report["nyu_normals"] = json.load(open(mj))
    else:
        skipped["nyu_normals"] = missing

    # --- Motion segmentation mIoU --------------------------------------
    mot_ck = os.path.join(ck, "best.pt")
    mot_data = os.path.join(dd, "kitti_motion")
    missing = have(mot_ck, mot_data)
    if not missing:
        from sndepth_tpu.cli import evaluate_motion
        conv = _convert("motion", args.out_dir, ckpt=mot_ck)
        mj = os.path.join(args.out_dir, "motion_metrics.json")
        evaluate_motion.main([
            "--data_dir", mot_data, "--ckpt_dir", conv,
            "--metrics_json", mj])
        report["kitti_motion_miou"] = json.load(open(mj))
    else:
        skipped["kitti_motion_miou"] = missing

    # --- Emit ----------------------------------------------------------
    print("\n# Parity report\n")
    print("| benchmark | metric | value |")
    print("|---|---|---|")
    for bench, metrics in report.items():
        for k, v in metrics.items():
            print(f"| {bench} | {k} | {v:.4f} |")
    for bench, missing in skipped.items():
        print(f"| {bench} | SKIPPED | missing: {', '.join(missing)} |")

    out = {"metrics": report, "skipped": skipped}
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {os.path.join(args.out_dir, 'report.json')}")


if __name__ == "__main__":
    main()
