"""MVS training/inference datasets (the TransMVSNet-side data layer).

Behavioral reference: deps/TransMVSNet/datasets/dtu_yao.py in
malteprinzler/diner. DTU with the 4-view *corner configuration*: reference/
source views come from fixed corner-camera id tables (tl/bl/tr/br,
dtu_yao.py:27-46); 7 lights for training, light 3 for val; 1600x1200 images
are half-sized then center-ish cropped to 512x640 (prepare_img,
dtu_yao.py:100-112); GT depth/mask pyramids at /4, /2, /1 (nearest); proj
matrices are (2, 4, 4) [extrinsics, intrinsics] stacks with stage-scaled
intrinsics (stage1 = the cam file's quarter-res K; x2, x4 for stages 2/3).

Output batch dict (numpy, NHWC):
  imgs (V, 512, 640, 3), proj_matrices {stage1..3: (V, 2, 4, 4)},
  depth_values (D,), depth {stage1..3}, mask {stage1..3}, dpath (str).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from diner_tpu.core.config import register
from diner_tpu.data.codecs import read_pfm

# Corner-camera id tables (dtu_yao.py:27-32).
_TL = [10, 0, 1, 2, 9, 13, 12, 11, 10]
_BL = [30, 27, 26, 25, 31, 45, 46, 47, 29]
_TR = [6, 2, 3, 4, 5, 18, 17, 16, 7]
_BR = [35, 22, 21, 20, 36, 40, 41, 42, 34]


def corner_view_metas(mode: str):
    """[(target_id, [src ids x3])]: each corner's cams vs the other corners."""
    tl, bl, tr, br = (_TL, _BL, _TR, _BR) if mode == "train" else (
        _TL[:1], _BL[:1], _TR[:1], _BR[:1])
    targets = tl + bl + tr + br
    srcs = ([list(t) for t in zip(bl, tr, br)]
            + [list(t) for t in zip(tl, tr, br)]
            + [list(t) for t in zip(tl, bl, br)]
            + [list(t) for t in zip(tl, bl, tr)])
    return list(zip(targets, srcs))


def prepare_img(hr_img):
    """1600x1200 -> /2 -> crop to 512x640 (dtu_yao.py:100-112)."""
    h, w = hr_img.shape[:2]
    ds = hr_img[::2, ::2] if (h, w) == (1200, 1600) else hr_img
    h, w = ds.shape[:2]
    start_h, start_w = (h - 512) // 2, (w - 640) // 2
    return ds[start_h:start_h + 512, start_w:start_w + 640]


def _pyramid(img, nearest=True):
    h, w = img.shape[:2]
    out = {"stage3": img}
    for stage, s in (("stage2", 2), ("stage1", 4)):
        ys = (np.arange(h // s) * s).astype(np.int64)
        xs = (np.arange(w // s) * s).astype(np.int64)
        out[stage] = img[ys][:, xs]
    return out


def _read_cam_txt(path):
    """Parse the MVSNet cam-file layout shared by every adapter
    (reference datasets/data_io.py): extrinsics block, intrinsics block, and
    the depth-spec tokens of line 11 (interpretation varies per dataset)."""
    lines = [ln.rstrip() for ln in Path(path).read_text().splitlines()]
    ext = np.fromstring(" ".join(lines[1:5]), np.float32, sep=" ").reshape(4, 4)
    K = np.fromstring(" ".join(lines[7:10]), np.float32, sep=" ").reshape(3, 3)
    return K, ext, lines[11].split()


def _stage_pyramid_projs(projs):
    """(V, 2, 4, 4) stage1 [ext, K4] stacks -> the 3-stage dict with
    intrinsics x2 / x4 (the cascade's stage scaling, shared by all five
    dataset adapters)."""
    out = {"stage1": projs}
    for name, sc in (("stage2", 2.0), ("stage3", 4.0)):
        p = projs.copy()
        p[:, 1, :2] *= sc
        out[name] = p
    return out


@register("DTUMVSDataset")
class DTUMVSDataset:
    """DTU for MVS training / depth-prior writing."""

    def __init__(self, datapath, listfile, mode: str = "train", nviews: int = 4,
                 ndepths: int = 192, interval_scale: float = 1.06):
        assert nviews == 4
        self.datapath = Path(datapath)
        self.mode = mode
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        scans = [ln.strip() for ln in Path(listfile).read_text().splitlines()
                 if ln.strip()]
        lights = range(7) if mode == "train" else [3]
        self.metas = [(scan, light, t, s)
                      for scan in scans
                      for t, s in corner_view_metas(mode)
                      for light in lights]

    def __len__(self):
        return len(self.metas)

    def _read_cam(self, path):
        K, ext, vals = _read_cam_txt(path)
        return K, ext, float(vals[0]), float(vals[1]) * self.interval_scale

    def __getitem__(self, idx):
        from PIL import Image

        scan, light, target, srcs = self.metas[idx]
        view_ids = [target] + list(srcs)

        imgs, projs = [], []
        depth_values = None
        depth_ms = mask_ms = None
        dpath = None
        for i, vid in enumerate(view_ids):
            img_p = (self.datapath / f"Rectified/{scan}_train" /
                     f"rect_{vid + 1:03d}_{light}_r5000.png")
            img = np.asarray(Image.open(img_p), np.float32) / 255.0
            imgs.append(prepare_img(img))

            K, ext, dmin, dint = self._read_cam(
                self.datapath / "Cameras/train" / f"{vid:08d}_cam.txt")
            proj = np.stack([ext, np.block([[K, np.zeros((3, 1))],
                                            [np.zeros((1, 3)), np.ones((1, 1))]]
                                           ).astype(np.float32)])
            projs.append(proj)

            if i == 0:
                depth_values = (dmin + np.arange(self.ndepths, dtype=np.float32)
                                * dint)
                dpath = str(self.datapath / "Depths" / scan /
                            f"depth_map_{vid:04d}.pfm")
                gt_p = Path(dpath)
                if gt_p.exists():
                    d = prepare_img(read_pfm(gt_p)[0])
                    depth_ms = _pyramid(d)
                    mask_ms = {k: (v > 0).astype(np.float32)
                               for k, v in depth_ms.items()}

        projs = np.stack(projs)  # (V, 2, 4, 4), intrinsics at 1/4 res
        proj_ms = _stage_pyramid_projs(projs)

        sample = {
            "imgs": np.stack(imgs),
            "proj_matrices": proj_ms,
            "depth_values": depth_values,
            "dpath": dpath,
            "view_ids": np.asarray(view_ids),
            "scan": scan,
            "light_idx": light,
        }
        if depth_ms is not None:
            sample["depth"] = depth_ms
            sample["mask"] = mask_ms
        return sample


@register("FacescapeMVSDataset")
class FacescapeMVSDataset:
    """FaceScape adapter for MVS training/depth-writing.

    Behavioral reference: deps/TransMVSNet/datasets/facescape.py:19-200 in
    malteprinzler/diner — re-uses the DINER FaceScape metas and converts each
    to leave-one-out MVS samples (every ref view once as MVS-reference, the
    others as sources); depth hypotheses = linspace(znear=1, zfar=2.5, D);
    per-stage proj intrinsics are the full-res K *divided* by stage scale.
    """

    znear = 1.0
    zfar = 2.5

    def __init__(self, root, stage: str = "train", ndepths: int = 384,
                 meta_dir=None, **facescape_kwargs):
        from diner_tpu.data.facescape import FacescapeDataset

        # the MVS adapter filters views by the GT mesh depth (reference
        # facescape.py:18 DEPTH_FNAME='depth.png') — the DINER default
        # depth_TransMVSNet.png is exactly what `mvs write` is about to
        # CREATE, so a fresh dataset would yield zero metas
        facescape_kwargs.setdefault("depth_fname", "depth.png")
        self.base = FacescapeDataset(root, stage=stage, meta_dir=meta_dir,
                                     **facescape_kwargs)
        self.ndepths = ndepths
        # leave-one-out over UNIQUE camera quadruples: many DINER metas (one
        # per target view) share (scan_path, ref_ids); without the dedup
        # (reference facescape.py:62-79) `mvs write` re-infers and rewrites
        # the same depth maps tens of times (robust to != 4 ref rows)
        seen, self.metas = set(), []
        for m in self.base.metas:
            key = (m["scan_path"], tuple(tuple(r) for r in m["ref_ids"]))
            if key in seen:
                continue
            seen.add(key)
            self.metas += [(m, r) for r in range(len(m["ref_ids"]))]

    def __len__(self):
        return len(self.metas)

    def __getitem__(self, idx):
        import json

        if not self.metas:
            raise IndexError(
                "FacescapeMVSDataset is empty (stage="
                f"{self.base.stage!r}, root={self.base.data_dir}); check "
                "that depth files pass the zfar/frontal meta filters and "
                "that the split has subjects")
        meta, ref_slot = self.metas[idx]
        ref_ids = [s[0] for s in meta["ref_ids"]]
        view_ids = [ref_ids[ref_slot]] + [r for i, r in enumerate(ref_ids)
                                          if i != ref_slot]
        scan_path = self.base.data_dir / meta["scan_path"]
        cam_dict = json.loads((scan_path / "cameras.json").read_text())

        from diner_tpu.data.facescape import _read_rgba, _to_h

        imgs, projs = [], []
        dpath = None
        depth_ms = mask_ms = None
        for i, vid in enumerate(view_ids):
            vdir = scan_path / self.base.int_to_viewdir(int(vid))
            rgb, alpha = _read_rgba(vdir / self.base.RGBA_FNAME)
            imgs.append(rgb)
            ext = _to_h(cam_dict[vid]["extrinsics"])
            K = np.asarray(cam_dict[vid]["intrinsics"], np.float32)
            K4 = np.eye(4, dtype=np.float32)
            K4[:3, :3] = K
            K4[:2] /= 4.0  # stage1 intrinsics at quarter res
            projs.append(np.stack([ext, K4]))
            if i == 0:
                dpath = str(vdir / "depth.png")  # GT depth path anchor
                # training GT: mesh-rendered depth + alpha mask pyramids
                # (reference facescape.py:18,159-162; DEPTH_FNAME=depth.png)
                if Path(dpath).exists():
                    from diner_tpu.data.codecs import read_depth_png

                    d = read_depth_png(dpath).astype(np.float32)
                    depth_ms = _pyramid(d)
                    a = np.asarray(alpha, np.float32).reshape(d.shape)
                    m = ((a > 0.5) & (d > 0)).astype(np.float32)
                    mask_ms = _pyramid(m)

        projs = np.stack(projs)
        proj_ms = _stage_pyramid_projs(projs)

        depth_values = np.linspace(self.znear, self.zfar, self.ndepths
                                   ).astype(np.float32)
        sample = {
            "imgs": np.stack(imgs),
            "proj_matrices": proj_ms,
            "depth_values": depth_values,
            "dpath": dpath,
            "view_ids": np.asarray([int(v) for v in view_ids]),
            "scan": meta["scan_path"],
        }
        if depth_ms is not None:
            sample["depth"] = depth_ms
            sample["mask"] = mask_ms
        return sample


@register("GeneralEvalMVSDataset")
class GeneralEvalMVSDataset:
    """Standard MVSNet eval layout: <scan>/{images/XXXXXXXX.jpg,
    cams/XXXXXXXX_cam.txt, pair.txt}.

    Behavioral reference: deps/TransMVSNet/datasets/general_eval.py in
    malteprinzler/diner (DTU test split / custom scenes): pair.txt picks the
    top source views per reference view; depth hypotheses from the cam file's
    depth_min/interval.
    """

    def __init__(self, datapath, scans, nviews: int = 5, ndepths: int = 192,
                 interval_scale: float = 1.06, img_ext: str = ".jpg",
                 max_h: int = 864, max_w: int = 1152):
        self.datapath = Path(datapath)
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        self.img_ext = img_ext
        self.max_h, self.max_w = max_h, max_w
        self.metas = []
        for scan in scans:
            pair = (self.datapath / scan / "pair.txt").read_text().splitlines()
            n = int(pair[0])
            for i in range(n):
                ref = int(pair[1 + 2 * i])
                srcs = [int(x) for x in pair[2 + 2 * i].split()[1::2]]
                if srcs:
                    self.metas.append((scan, ref, srcs))

    def __len__(self):
        return len(self.metas)

    @staticmethod
    def scale_mvs_input(img, K, max_w, max_h, base: int = 32):
        """Reference general_eval.py:96-113: cap to (max_h, max_w) keeping
        aspect, snap BOTH dims down to a multiple of `base` (the cascade's
        3-level /4-stage UNet needs /32 inputs), rescale K accordingly."""
        h, w = img.shape[:2]
        if h > max_h or w > max_w:
            scale = max_h / h
            if scale * w > max_w:
                scale = max_w / w
            new_w, new_h = scale * w // base * base, scale * h // base * base
        else:
            new_w, new_h = w // base * base, h // base * base
        K = K.copy()
        K[0, :] *= new_w / w
        K[1, :] *= new_h / h
        if (new_h, new_w) != (h, w):
            try:
                import cv2

                img = cv2.resize(img, (int(new_w), int(new_h)))
            except ImportError:
                from PIL import Image

                img = np.asarray(Image.fromarray(
                    (img * 255).astype(np.uint8)).resize(
                        (int(new_w), int(new_h))), np.float32) / 255.0
        return img, K

    def _read_cam(self, path):
        K, ext, vals = _read_cam_txt(path)
        dmin, dint = float(vals[0]), float(vals[1])
        if len(vals) >= 3:
            # 3-token depth spec: [min, interval, num]; respan num*interval
            # over self.ndepths hypotheses (general_eval.py:76-79)
            dmax = dmin + int(float(vals[2])) * dint
            dint = (dmax - dmin) / self.ndepths
        return K, ext, dmin, dint * self.interval_scale

    def __getitem__(self, idx):
        from PIL import Image

        scan, ref, srcs = self.metas[idx]
        view_ids = [ref] + srcs[: self.nviews - 1]
        imgs, projs = [], []
        depth_values = None
        for i, vid in enumerate(view_ids):
            img = np.asarray(Image.open(
                self.datapath / scan / "images" / f"{vid:08d}{self.img_ext}"),
                np.float32) / 255.0
            K, ext, dmin, dint = self._read_cam(
                self.datapath / scan / "cams" / f"{vid:08d}_cam.txt")
            img, K = self.scale_mvs_input(img[..., :3], K,
                                          self.max_w, self.max_h)
            imgs.append(img)
            # eval cam files store FULL-resolution K; stage1 runs at
            # quarter res (general_eval.py:71)
            K = K.copy()
            K[:2] /= 4.0
            K4 = np.eye(4, dtype=np.float32)
            K4[:3, :3] = K
            projs.append(np.stack([ext, K4]))
            if i == 0:
                depth_values = dmin + np.arange(self.ndepths,
                                                dtype=np.float32) * dint
        projs = np.stack(projs)
        proj_ms = _stage_pyramid_projs(projs)
        return {"imgs": np.stack(imgs), "proj_matrices": proj_ms,
                "depth_values": depth_values, "view_ids": np.asarray(view_ids),
                "scan": scan}


@register("MultifaceMVSDataset")
class MultifaceMVSDataset(FacescapeMVSDataset):
    """MultiFace adapter for MVS depth-writing.

    Behavioral reference: deps/TransMVSNet/datasets/multiface.py in
    malteprinzler/diner — leave-one-out over the DINER MultiFace metas,
    depth hypotheses linspace(0.5, 1.5, D), downsampled frames.
    """

    znear = 0.5
    zfar = 1.5

    def __init__(self, root, stage: str = "val", ndepths: int = 384,
                 downsample: int = 8, **mf_kwargs):
        from diner_tpu.data.multiface import MultiFaceDataset

        self.base = MultiFaceDataset(root, stage=stage, downsample=downsample,
                                     **mf_kwargs)
        self.ndepths = ndepths
        # leave-one-out over UNIQUE quadruples (see FacescapeMVSDataset);
        # keep the base index so __getitem__ can borrow the DINER sample
        seen, self.metas = set(), []
        for bi, m in enumerate(self.base.metas):
            key = (m["scan_path"], tuple(m["ref_ids"]))
            if key in seen:
                continue
            seen.add(key)
            self.metas += [(bi, m, r) for r in range(4)]

    def __getitem__(self, idx):
        base_idx, meta, ref_slot = self.metas[idx]
        ref_ids = list(meta["ref_ids"])
        view_ids = [ref_ids[ref_slot]] + [r for i, r in enumerate(ref_ids)
                                          if i != ref_slot]
        # reuse the DINER loader for images/cams by borrowing its sample
        s = self.base[base_idx]
        order = [list(meta["ref_ids"]).index(v) for v in view_ids]
        imgs = s["src_rgbs"][order]
        exts = s["src_extrinsics"][order]
        Ks = s["src_intrinsics"][order]
        projs = []
        for e, K in zip(exts, Ks):
            K4 = np.eye(4, dtype=np.float32)
            K4[:3, :3] = K
            K4[:2] /= 4.0
            projs.append(np.stack([e, K4]))
        projs = np.stack(projs)
        proj_ms = _stage_pyramid_projs(projs)

        # GT depth path for the MVS reference view (write_prediction writes
        # <stem>_<suffix>.png next to it; reference multiface.py:219,290):
        # images/<seq>/<view>/<frame>.png -> depths/... via the base mapping
        scan_path = Path(meta["scan_path"])
        subject = scan_path.parents[3].name
        seq = scan_path.parents[1].name
        frame = scan_path.stem
        ref_img = (self.base.data_dir / subject / "images" / seq /
                   str(view_ids[0]) / f"{frame}.png")
        dpath = str(self.base._dpath(ref_img))

        sample = {"imgs": imgs, "proj_matrices": proj_ms,
                  "depth_values": np.linspace(self.znear, self.zfar,
                                              self.ndepths).astype(np.float32),
                  "dpath": dpath,
                  "view_ids": np.asarray([int(v) for v in view_ids]),
                  "scan": meta["scan_path"]}
        if Path(dpath).exists():
            # training GT pyramids (reference multiface.py:219-236)
            d = np.asarray(self.base.read_depth(Path(dpath)), np.float32)
            if d.ndim == 3:
                d = d[..., 0]
            # GT is stored at capture resolution; the images above are
            # downsampled and /32-snapped (reference multiface.py:221
            # resizes depth to the image size before pyramiding)
            h, w = imgs.shape[1:3]
            if d.shape != (h, w):
                from diner_tpu.data.codecs import nearest_resize

                d = nearest_resize(d, h, w)
            sample["depth"] = _pyramid(d)
            sample["mask"] = {k: (v > 0).astype(np.float32)
                              for k, v in sample["depth"].items()}
        return sample


@register("BlendedMVSDataset")
class BlendedMVSDataset:
    """BlendedMVS finetuning set.

    Behavioral reference: deps/TransMVSNet/datasets/bld_train.py in
    malteprinzler/diner. Layout: <scan>/blended_images/XXXXXXXX.jpg,
    <scan>/cams/{pair.txt, XXXXXXXX_cam.txt}, <scan>/rendered_depth_maps/
    XXXXXXXX.pfm. The cam file's K is full-resolution -> /4 gives the stage1
    intrinsics (bld_train.py:61); the depth interval is derived from the cam
    bounds as (depth_max - depth_min) / ndepths (bld_train.py:67-69); the GT
    mask keeps depths inside [depth_min, depth_min + interval*(ndepths-1)]
    (bld_train.py:131-132).
    """

    def __init__(self, datapath, listfile, mode: str = "train", nviews: int = 4,
                 ndepths: int = 192, interval_scale: float = 1.0):
        self.datapath = Path(datapath)
        self.nviews = nviews
        self.ndepths = ndepths
        if isinstance(listfile, (str, Path)):
            # a path MUST exist — falling back to list(str) would iterate
            # the filename character by character
            scans = [ln.strip() for ln in Path(listfile).read_text().splitlines()
                     if ln.strip()]
        else:
            scans = list(listfile)
        self.metas = []
        for scan in scans:
            pair = (self.datapath / scan / "cams" / "pair.txt"
                    ).read_text().splitlines()
            n = int(pair[0])
            for i in range(n):
                ref = int(pair[1 + 2 * i])
                srcs = [int(x) for x in pair[2 + 2 * i].split()[1::2]]
                if len(srcs) >= nviews - 1:
                    self.metas.append((scan, ref, srcs))

    def __len__(self):
        return len(self.metas)

    def _read_cam(self, path):
        K, ext, vals = _read_cam_txt(path)
        K[:2] /= 4.0  # bld cams store full-res K; stage1 is quarter res
        dmin, dmax = float(vals[0]), float(vals[-1])
        return K, ext, dmin, (dmax - dmin) / self.ndepths

    def __getitem__(self, idx):
        from PIL import Image

        scan, ref, srcs = self.metas[idx]
        view_ids = [ref] + srcs[: self.nviews - 1]
        imgs, projs = [], []
        depth_values = depth_ms = mask_ms = None
        dint = None
        for i, vid in enumerate(view_ids):
            img = np.asarray(Image.open(
                self.datapath / scan / "blended_images" / f"{vid:08d}.jpg"),
                np.float32)[..., :3] / 255.0
            imgs.append(img)
            K, ext, dmin, di = self._read_cam(
                self.datapath / scan / "cams" / f"{vid:08d}_cam.txt")
            K4 = np.eye(4, dtype=np.float32)
            K4[:3, :3] = K
            projs.append(np.stack([ext, K4]))
            if i == 0:
                dint = di
                depth_values = dmin + np.arange(self.ndepths,
                                                dtype=np.float32) * di
                depth = read_pfm(self.datapath / scan / "rendered_depth_maps"
                                 / f"{vid:08d}.pfm")[0]
                depth_end = dmin + di * (self.ndepths - 1)
                mask = ((depth >= dmin) & (depth <= depth_end)
                        ).astype(np.float32)
                depth_ms = _pyramid(depth)
                mask_ms = _pyramid(mask)

        projs = np.stack(projs)
        proj_ms = _stage_pyramid_projs(projs)
        return {"imgs": np.stack(imgs), "proj_matrices": proj_ms,
                "depth": depth_ms, "mask": mask_ms,
                "depth_values": depth_values,
                "depth_interval": np.asarray(dint, np.float32),
                "scan": scan, "dpath": None}


# published capture resolutions of the Tanks&Temples scenes
# (tnt_eval.py:26-40 — dataset-dictated constants)
TNT_IMAGE_SIZES = {
    "Family": (1920, 1080), "Francis": (1920, 1080), "Horse": (1920, 1080),
    "Lighthouse": (2048, 1080), "M60": (2048, 1080), "Panther": (2048, 1080),
    "Playground": (1920, 1080), "Train": (1920, 1080),
    "Auditorium": (1920, 1080), "Ballroom": (1920, 1080),
    "Courtroom": (1920, 1080), "Museum": (1920, 1080),
    "Palace": (1920, 1080), "Temple": (1920, 1080),
}


@register("TnTEvalDataset")
class TnTEvalDataset:
    """Tanks & Temples eval set (no GT depth).

    Behavioral reference: deps/TransMVSNet/datasets/tnt_eval.py in
    malteprinzler/diner. Layout: <scan>/images/XXXXXXXX.jpg,
    <scan>/cams_1/XXXXXXXX_cam.txt, <scan>/pair.txt. Images are scaled to the
    per-scene max size, snapped DOWN to multiples of 32 with matching
    intrinsic scaling (tnt_eval.py:99-116); the first processed image fixes
    the scene resolution (fix_res). depth_interval = (depth_max - depth_min)
    / ndepths from the cam bounds.
    """

    def __init__(self, datapath, scans, nviews: int = 5, ndepths: int = 192,
                 image_sizes=None, fix_res: bool = True):
        self.datapath = Path(datapath)
        self.nviews = nviews
        self.ndepths = ndepths
        self.image_sizes = dict(TNT_IMAGE_SIZES, **(image_sizes or {}))
        self.fix_res = fix_res
        self._fixed_hw = None
        self.metas = []
        for scan in scans:
            pair = (self.datapath / scan / "pair.txt").read_text().splitlines()
            n = int(pair[0])
            for i in range(n):
                ref = int(pair[1 + 2 * i])
                srcs = [int(x) for x in pair[2 + 2 * i].split()[1::2]]
                if srcs:
                    self.metas.append((scan, ref, srcs))

    def __len__(self):
        return len(self.metas)

    def _read_cam(self, path):
        K, ext, vals = _read_cam_txt(path)
        dmin, dmax = float(vals[0]), float(vals[-1])
        return K, ext, dmin, (dmax - dmin) / self.ndepths

    @staticmethod
    def _scale_input(img, K, max_w, max_h, base: int = 32):
        return GeneralEvalMVSDataset.scale_mvs_input(img, K, max_w, max_h,
                                                     base)

    def __getitem__(self, idx):
        from PIL import Image

        scan, ref, srcs = self.metas[idx]
        nviews = min(self.nviews, len(srcs) + 1)
        view_ids = [ref] + srcs[: nviews - 1]
        max_w, max_h = self.image_sizes.get(scan, (1920, 1080))

        imgs, projs = [], []
        depth_values = None
        for i, vid in enumerate(view_ids):
            img = np.asarray(Image.open(
                self.datapath / scan / "images" / f"{vid:08d}.jpg"),
                np.float32)[..., :3] / 255.0
            K, ext, dmin, dint = self._read_cam(
                self.datapath / scan / "cams_1" / f"{vid:08d}_cam.txt")
            img, K = self._scale_input(img, K, max_w, max_h)
            if self.fix_res and self._fixed_hw is None:
                self._fixed_hw = img.shape[:2]
            if self._fixed_hw is not None and img.shape[:2] != self._fixed_hw:
                sh = self._fixed_hw[0] / img.shape[0]
                sw = self._fixed_hw[1] / img.shape[1]
                pil = Image.fromarray((img * 255).astype(np.uint8))
                img = np.asarray(pil.resize((self._fixed_hw[1],
                                             self._fixed_hw[0]),
                                            Image.BILINEAR), np.float32) / 255.0
                K = K.copy()
                K[0] *= sw
                K[1] *= sh
            imgs.append(img)
            K4 = np.eye(4, dtype=np.float32)
            K4[:3, :3] = K
            projs.append(np.stack([ext, K4]))
            if i == 0:
                depth_values = dmin + np.arange(self.ndepths,
                                                dtype=np.float32) * dint

        projs = np.stack(projs)
        # cams_1 K is the stage1 (quarter-res) intrinsics, like DTU/BLD
        # (tnt_eval.py:186-190: stage2 = x2, stage3 = x4)
        proj_ms = _stage_pyramid_projs(projs)
        return {"imgs": np.stack(imgs), "proj_matrices": proj_ms,
                "depth_values": depth_values,
                "view_ids": np.asarray(view_ids), "scan": scan}
