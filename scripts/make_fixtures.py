"""Generate tiny REAL-FORMAT dataset fixtures for tests (committed).

The reference trains on actual MNIST / CIFAR-10 / PhysioNet artifacts
(``experiments/mnist_ode/main.jl:48-51``, ``experiments/physionet/main.jl:11-30``).
This environment has zero egress, so the repo ships byte-exact *format*
fixtures with synthetic content: IDX (incl. gzip), the CIFAR-10 binary
batch layout, and the feature-major physionet.npz schema. Tests drive
``load_mnist`` / ``load_cifar10`` / ``build_physionet_arrays`` through the
real-data branches against these files (tests/test_real_data.py).

Deterministic; re-running reproduces identical bytes (gzip mtime pinned).
"""
import gzip
import os
import struct

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def write_idx(path: str, arr: np.ndarray, compress: bool) -> None:
    """IDX format: magic (2 zero bytes, dtype byte 0x08=ubyte, ndim byte),
    then big-endian dims, then raw data."""
    header = struct.pack(">I", 0x0800 | arr.ndim)
    header += struct.pack(f">{arr.ndim}I", *arr.shape)
    payload = header + arr.astype(np.uint8).tobytes()
    if compress:
        with open(path, "wb") as raw:
            with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
                f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def mnist_like(n, seed):
    """Digit-prototype ubyte images, same generator family as the synthetic
    fallback (harness/data.py) so training on the fixture is meaningful."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 10, size=n).astype(np.uint8)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    protos = np.stack(
        [
            np.sin((c % 4 + 1) * np.pi * yy / 28)
            * np.sin((c // 4 + 1) * np.pi * xx / 28)
            for c in range(10)
        ]
    )
    x = protos[y] * 0.5 + 0.5 + 0.1 * rng.randn(n, 28, 28)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8), y


def cifar_like(n, seed):
    """Class-prototype RGB images (round 5: the previous uniform-noise +
    random-label fixture was unlearnable by construction, so the
    fixtures-smoke learning bar could never pass for the conv family)."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 10, size=n).astype(np.uint8)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    protos = np.stack(
        [
            np.stack(
                [
                    np.sin((c % 4 + 1) * np.pi * yy / 32)
                    * np.sin((c // 4 + ch + 1) * np.pi * xx / 32)
                    for ch in range(3)
                ],
                axis=-1,
            )
            for c in range(10)
        ]
    )
    x = protos[y] * 0.5 + 0.5 + 0.1 * rng.randn(n, 32, 32, 3)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8), y


def main():
    # --- MNIST: IDX (train gz, test raw — both openers exercised) + npz
    idx_dir = os.path.join(ROOT, "mnist_idx")
    npz_dir = os.path.join(ROOT, "mnist_npz")
    os.makedirs(idx_dir, exist_ok=True)
    os.makedirs(npz_dir, exist_ok=True)
    xtr, ytr = mnist_like(64, seed=10)
    xte, yte = mnist_like(16, seed=11)
    write_idx(os.path.join(idx_dir, "train-images-idx3-ubyte.gz"), xtr, True)
    write_idx(os.path.join(idx_dir, "train-labels-idx1-ubyte.gz"), ytr, True)
    write_idx(os.path.join(idx_dir, "t10k-images-idx3-ubyte"), xte, False)
    write_idx(os.path.join(idx_dir, "t10k-labels-idx1-ubyte"), yte, False)
    np.savez_compressed(
        os.path.join(npz_dir, "mnist.npz"),
        x_train=xtr, y_train=ytr, x_test=xte, y_test=yte,
    )

    # --- CIFAR-10: binary batches (label byte + 3072 channel-major) + npz
    bin_dir = os.path.join(ROOT, "cifar_bin", "cifar-10-batches-bin")
    cnpz_dir = os.path.join(ROOT, "cifar_npz")
    os.makedirs(bin_dir, exist_ok=True)
    os.makedirs(cnpz_dir, exist_ok=True)
    xs, ys = [], []
    for i in range(1, 6):
        x, y = cifar_like(8, seed=20 + i)
        rows = np.concatenate(
            [y[:, None], x.transpose(0, 3, 1, 2).reshape(8, 3072)], axis=1
        ).astype(np.uint8)
        rows.tofile(os.path.join(bin_dir, f"data_batch_{i}.bin"))
        xs.append(x)
        ys.append(y)
    xte_c, yte_c = cifar_like(8, seed=29)
    np.concatenate(
        [yte_c[:, None], xte_c.transpose(0, 3, 1, 2).reshape(8, 3072)], axis=1
    ).astype(np.uint8).tofile(os.path.join(bin_dir, "test_batch.bin"))
    np.savez_compressed(
        os.path.join(cnpz_dir, "cifar10.npz"),
        x_train=np.concatenate(xs), y_train=np.concatenate(ys),
        x_test=xte_c, y_test=yte_c,
    )

    # --- PhysioNet: feature-major npz, full reference key schema
    phys_dir = os.path.join(ROOT, "physionet")
    os.makedirs(phys_dir, exist_ok=True)
    rng = np.random.RandomState(30)
    F, T, N = 37, 49, 40
    tgrid = np.sort(rng.rand(T).astype(np.float32))
    tgrid[0] = 0.0
    tp = np.broadcast_to(tgrid[:, None], (T, N)).astype(np.float32)
    # LEARNABLE content (round 5): a latent-oscillator decode + noise,
    # like harness.data.synthetic_physionet — the previous iid-Gaussian
    # fixture was unlearnable by construction, so the fixtures-smoke
    # learning bar (mse <= 0.7x zero-prediction) could never pass for
    # this family. Format (feature-major, full key schema) unchanged.
    decoder = rng.randn(2, F).astype(np.float32) * 0.5
    phase = rng.rand(N, 1).astype(np.float32) * 2 * np.pi
    freqs = 1.0 + rng.rand(N, 1).astype(np.float32)
    z1 = np.sin(2 * np.pi * freqs * tgrid[None, :] + phase)
    z2 = np.cos(2 * np.pi * freqs * tgrid[None, :] + phase)
    latent = np.stack([z1, z2], axis=-1)  # (N, T, 2)
    series = latent @ decoder + 0.1 * rng.randn(N, T, F)
    data = np.ascontiguousarray(
        series.transpose(2, 1, 0)
    ).astype(np.float32)  # -> (F, T, N)
    mask = (rng.rand(F, T, N) < 0.5).astype(np.float32)
    np.savez_compressed(
        os.path.join(phys_dir, "physionet.npz"),
        observed_data=data, observed_mask=mask, observed_tp=tp,
        data_to_predict=data, mask_predicted_data=mask, tp_to_predict=tp,
    )
    print("fixtures written under", os.path.abspath(ROOT))


if __name__ == "__main__":
    main()
