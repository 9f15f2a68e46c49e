"""Offline ETL: .mat -> .npy.

Host-side pipeline with the reference's exact semantics
(reference: DataFilePlayGround.py:286-439 fileLoop):

per patient .mat file:
  * load masks (normalMask / bloodMask / brainMask), bModeNorm, displacement,
    hrTimes (scipy.io.loadmat — host-only, as in the reference),
  * per cardiac cycle h: real = displacement[:, :, s:s+5],
    imag = displacement[:, :, s+5:s+10] with s = ceil(30 * hrTimes[h])
    (DataFilePlayGround.py:313-318),
  * bMode -> log10, mean over its trailing axis (:327,:351),
  * label: brain-mask objective -> {0,1}; bleed objective -> {1,2} by
    bloodMask>normalMask, Gaussian-blurred twice with bleed re-stamped
    (:330-343), resized to (256, 80), zeroed outside the brain,
  * per-cycle displacement normalize: zero-mean, max-abs-1 per channel
    (:368-376), resize to (256, 80), zero outside brain for the bleed
    objective (:384-388),
  * emit [label | real(5) | imag(5) | bMode] = [256, 80, 12] (:393),
  * 10% test fold by file count (count % 10 == iteration — :397),
  * bad-patient exclusion (:278-279, kept in config.DataConfig).

Resize/blur use the framework's XLA ops (ops.resize) on the CPU backend
instead of OpenCV.  Parallel fan-out uses a process pool like the reference's
multiprocessing loop (:448-463) but without its broken cross-process lock
(SURVEY.md §2.12).
"""

from __future__ import annotations

import math
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ultrasound_modeling_tpu.config import DataConfig

TARGET_HW = (256, 80)


def _resize(img: np.ndarray, hw: Tuple[int, int] = TARGET_HW) -> np.ndarray:
    import jax.numpy as jnp
    from ultrasound_modeling_tpu.ops import resize as rops
    return np.asarray(rops.resize_bilinear(jnp.asarray(img), hw))


def _blur(img: np.ndarray, ksize: int, sigma: float) -> np.ndarray:
    import jax.numpy as jnp
    from ultrasound_modeling_tpu.ops import resize as rops
    return np.asarray(rops.gaussian_blur(jnp.asarray(img), ksize, sigma))


def build_label(normal_mask: np.ndarray, blood_mask: np.ndarray,
                brain_mask: np.ndarray, objective: int) -> np.ndarray:
    """Soft label map (reference: DataFilePlayGround.py:330-343)."""
    brain_resized = _resize(brain_mask.astype(np.float32))
    if objective == 0:
        label = np.where(brain_resized == 0, 0.0, 1.0).astype(np.float32)
    else:
        bleed = blood_mask > normal_mask
        label = np.where(bleed, 2.0, 1.0).astype(np.float32)
        label = _blur(label, 9, 4.0)
        label = np.where(bleed, 2.0, label)
        label = _blur(label, 3, 2.0)
        label = np.where(bleed, 2.0, label)
        label = _resize(label)
        label = np.where(brain_resized == 0, 0.0, label)
    return label.reshape(TARGET_HW + (1,)).astype(np.float32)


def normalize_displacement(d: np.ndarray) -> np.ndarray:
    """Zero-mean, max-abs-1 per channel (reference: DataFilePlayGround.py:368-376)."""
    d = d - d.mean(axis=(0, 1))
    safe_max = np.abs(d).max(axis=(0, 1))
    safe_max[safe_max == 0] = 1.0
    return d / safe_max


def cardiac_cycle_slices(displacement: np.ndarray, hr_times: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Split displacement into per-cycle (real, imag) 5-frame windows
    (reference: DataFilePlayGround.py:309-318)."""
    n_cycles = hr_times.shape[1] - 1
    h, w = displacement.shape[:2]
    real = np.zeros((h, w, 5, n_cycles))
    imag = np.zeros((h, w, 5, n_cycles))
    for h_i in range(n_cycles):
        start = int(math.ceil(30 * hr_times[0, h_i]))
        real[:, :, :, h_i] = displacement[:, :, start:start + 5]
        imag[:, :, :, h_i] = displacement[:, :, start + 5:start + 10]
    return real, imag


def build_label_iph(blood_mask_thick: np.ndarray,
                    brain_mask: np.ndarray) -> np.ndarray:
    """IPH ("pizza") variant: label = bloodMaskThick + 1, zeroed outside the
    brain, no Gaussian smoothing (reference: PizzaPlayGround.py:92-100)."""
    brain_resized = _resize(brain_mask.astype(np.float32))
    label = _resize((blood_mask_thick + 1.0).astype(np.float32))
    label = np.where(brain_resized == 0, 0.0, label)
    return label.reshape(TARGET_HW + (1,)).astype(np.float32)


def fetch_time_data(path: str) -> np.ndarray:
    """Harmonics -> waveform synthesis (reference: DataFilePlayGround.py:21-83
    FetchTimeData): per-pixel time waveform from 6 harmonic magnitudes/phases,
    sampled at t=0 and t=17 of a 50-tick period, plus the first-harmonic
    magnitude fraction M1; zero-mean/max-abs-1 normalized, zeroed outside the
    brain, resized to (256, 80) and concatenated with the label.

    Returns ``[256, 80, 4]`` = [label | form(0) | form(17) | M1].
    """
    from scipy.io import loadmat

    mat = loadmat(path)
    harm = np.asarray(mat["harmonics"])
    normal = np.nan_to_num(np.asarray(mat["normalMask"]))
    blood = np.nan_to_num(np.asarray(mat["bloodMask"]))
    brain = np.asarray(mat["brainMask"])

    period = 50
    mag = np.abs(harm)
    phase = np.angle(harm)
    k = np.arange(1, 7)
    # form[t] = sum_k mag_k * sin(2*pi*k*(t+1)/period + phase_k); the
    # reference samples form[:, :, 0] and form[:, :, 17]
    # (DataFilePlayGround.py:30-37,61-62 — vectorized here).
    tt = np.array([1.0, 18.0])  # tick values at indices 0 and 17
    ang = (2 * np.pi * k[None, None, :, None] * tt[None, None, None, :]
           / period) + phase[..., 1:7, None]
    form = np.sum(mag[..., 1:7, None] * np.sin(ang), axis=2)  # [H, W, 2]

    mo = mag[..., 0:7].sum(axis=-1)
    m1 = np.divide(mag[..., 0], np.where(mo == 0, 1.0, mo))

    out = np.concatenate([form, m1[..., None]], axis=-1)
    out = out - out.mean(axis=(0, 1))
    safe_max = np.abs(out).max(axis=(0, 1))
    safe_max[safe_max == 0] = 1.0
    out = out / safe_max
    out = np.where(brain[..., None] == 0, 0.0, out)
    out = _resize(out.astype(np.float32))

    label = np.where(blood > normal, 2.0, 1.0)
    label = np.where(brain == 0, 0.0, label).astype(np.float32)
    label = _resize(label)
    return np.concatenate([label.reshape(TARGET_HW + (1,)), out],
                          axis=-1).astype(np.float32)


def process_mat_file(path: str, objective,
                     label_mode: str = "v2") -> List[np.ndarray]:
    """One .mat file -> list of [256, 80, 12] samples (one per cardiac cycle).

    ``objective``: 0 = brain-mask labels, 1 = bleed labels
    (reference: DataFilePlayGround.py:286,331-343), "iph" = bloodMaskThick+1
    labels on the IPH subset (reference: PizzaPlayGround.py:57-100),
    "waveform" = harmonics->waveform synthesis (one [256,80,4] sample per
    file; reference: DataFilePlayGround.py:21-83).

    ``label_mode`` (objective 1 only): "v2" = Gaussian-blurred soft
    blood>normal labels (DataFilePlayGround.py:330-343); "v1" = hard
    ``bloodMaskThick + 1`` labels with no smoothing, the ETL-v1 objective
    outside the IPH subset (reference: DataPreprocessing.py:122,144-146).
    """
    from scipy.io import loadmat

    if objective == "waveform":
        return [fetch_time_data(path)]

    mat = loadmat(path)
    brain_mask = np.asarray(mat["brainMask"])
    bmode = np.log10(np.asarray(mat["bModeNorm"], np.float64))
    displacement = np.asarray(mat["displacement"], np.float64)
    hr_times = np.asarray(mat["hrTimes"])

    if objective == "iph" or (objective == 1 and label_mode == "v1"):
        thick = np.asarray(mat.get("bloodMaskThick", np.zeros((0,))))
        if thick.size == 0:
            # skip files with empty thick masks (PizzaPlayGround.py:68-69;
            # v1 breaks out of the file loop, DataPreprocessing.py:126-127)
            return []
        label = build_label_iph(np.nan_to_num(thick), brain_mask)
    else:
        normal_mask = np.nan_to_num(np.asarray(mat["normalMask"]))
        blood_mask = np.nan_to_num(np.asarray(mat["bloodMask"]))
        label = build_label(normal_mask, blood_mask, brain_mask, objective)
    brain_resized = _resize(brain_mask.astype(np.float32))
    real, imag = cardiac_cycle_slices(displacement, hr_times)
    bmode = np.mean(bmode, axis=2)  # reference: DataFilePlayGround.py:351

    samples = []
    for k in range(real.shape[-1]):
        real_k = normalize_displacement(real[..., k])
        imag_k = normalize_displacement(imag[..., k])
        real_k = _resize(real_k.astype(np.float32))
        imag_k = _resize(imag_k.astype(np.float32))
        bmode_k = _resize(bmode[..., k].astype(np.float32)
                          if bmode.ndim == 3 else bmode.astype(np.float32))
        if objective in (1, "iph"):
            # zero non-brain input (DataFilePlayGround.py:384-388,
            # PizzaPlayGround.py:126-129)
            mask = (brain_resized == 0)[..., None]
            real_k = np.where(mask, 0.0, real_k)
            imag_k = np.where(mask, 0.0, imag_k)
        samples.append(np.concatenate(
            [label, real_k, imag_k, bmode_k.reshape(TARGET_HW + (1,))],
            axis=2).astype(np.float32))
    return samples


def _patient_worker(args):
    patient_dir, objective, label_mode = args
    out = []
    for fname in sorted(os.listdir(patient_dir)):
        if fname.endswith(".mat"):
            path = os.path.join(patient_dir, fname)
            try:
                samples = process_mat_file(path, objective, label_mode)
            except Exception as exc:  # skip unreadable files like the reference
                print(f"skipping {path}: {exc}")
                continue
            out.append((fname[:17], samples))
    return out


# IPH-mode bad-patient list (reference: PizzaPlayGround.py:50).
IPH_BAD_PATIENTS = (27, 28, 35, 36, 38, 49, 69, 90)


def run_etl(raw_data_path: str, save_path: str, objective,
            iteration: int = 1, cfg: Optional[DataConfig] = None,
            max_workers: int = 4, seed: int = 20,
            label_mode: str = "v2", split: str = "fold",
            test_size: float = 0.5, split_seed: int = 42) -> None:
    """Full ETL over a raw-data tree (reference: output2DImages,
    DataFilePlayGround.py:249-493; IPH mode: PizzaPlayGround.py:38-178;
    v1 mode: DataPreprocessing.py:105-196).

    ``objective``: 0 (brainMask folder), 1 (bleed folder), "iph"
    (pizza_IPH folder, IPH-patient subset only), or "waveform"
    (harmonics->waveform samples, DataFilePlayGround.py:21-83).

    ``label_mode``: "v2" blurred soft labels | "v1" hard bloodMaskThick+1
    labels (DataPreprocessing.py:122,144-146); objective 1 only.

    ``split``: "fold" = the v2 count%10 file fold
    (DataFilePlayGround.py:397) | "random" = the v1 sklearn
    ``train_test_split(test_size, random_state)`` over samples — exact
    seed-42 shuffle semantics (reference: DataPreprocessing.py:174-195,
    test_size 0.2/0.5).
    """
    cfg = cfg or DataConfig()
    folder_name = {0: "brainMask", 1: "bleed", "iph": "pizza_IPH",
                   "waveform": "waveform"}[objective]
    folder = os.path.join(save_path, folder_name)
    os.makedirs(folder, exist_ok=True)
    iteration = iteration % 10

    patients = sorted(os.listdir(raw_data_path))
    rng = np.random.default_rng(seed)
    rng.shuffle(patients)

    bad = IPH_BAD_PATIENTS if objective == "iph" else cfg.bad_patients
    jobs = []
    for p in patients:
        try:
            patient_num = int(p[-3:])
        except ValueError:
            continue
        if patient_num in bad:
            continue
        if objective == "iph" and patient_num not in cfg.iph_patients:
            continue  # IPH subset only (PizzaPlayGround.py:47-48,170)
        jobs.append((os.path.join(raw_data_path, p), objective, label_mode))

    if max_workers > 1:
        with ProcessPoolExecutor(max_workers=max_workers) as pool:
            results = list(pool.map(_patient_worker, jobs))
    else:
        results = [_patient_worker(j) for j in jobs]

    if split == "random":
        # v1 semantics: pool every sample, then one seeded sklearn split
        # (reference: DataPreprocessing.py:174-195).
        from sklearn.model_selection import train_test_split

        data, names = [], []
        for per_patient in results:
            for path_name, samples in per_patient:
                for image in samples:
                    data.append([image])
                    names.append([path_name])
        training, testing, train_paths, test_paths = train_test_split(
            np.asarray(data), np.asarray(names),
            test_size=test_size, random_state=split_seed)
    else:
        training, testing, train_paths, test_paths = [], [], [], []
        count = 0
        for per_patient in results:
            for path_name, samples in per_patient:
                for image in samples:
                    # 10% fold by file counter (DataFilePlayGround.py:397).
                    if count % 10 == iteration:
                        testing.append([image])
                        test_paths.append([path_name])
                    else:
                        training.append([image])
                        train_paths.append([path_name])
                count += 1
        perm = np.random.default_rng(seed + 1).permutation(len(training))
        training = np.asarray(training)[perm]
        train_paths = np.asarray(train_paths)[perm]
    np.save(os.path.join(folder, "TrainingData.npy"), np.asarray(training))
    np.save(os.path.join(folder, "TestingData.npy"), np.asarray(testing))
    np.save(os.path.join(folder, "TrainingPaths.npy"), np.asarray(train_paths))
    np.save(os.path.join(folder, "TestingPaths.npy"), np.asarray(test_paths))


def fetch_polar_axis(mat_path: str, axis_dir: str) -> None:
    """Cone-axis extraction (reference: DataFilePlayGround.py:86-100)."""
    from scipy.io import loadmat

    mat = loadmat(mat_path)
    xaxis = _resize(np.asarray(mat["xAxis"], np.float32),
                    (TARGET_HW[0] + 0, TARGET_HW[1] + 0)) + 100
    yaxis = _resize(np.asarray(mat["zAxis"], np.float32), TARGET_HW) - 4
    os.makedirs(axis_dir, exist_ok=True)
    np.save(os.path.join(axis_dir, "xAxis.npy"), xaxis)
    np.save(os.path.join(axis_dir, "yAxis.npy"), yaxis)
