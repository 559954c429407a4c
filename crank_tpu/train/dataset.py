"""Host-side dataset and batcher.

Replaces the reference's torch DataLoader + fork-worker stack
(crank/net/trainer/dataset.py) with a dependency-free numpy pipeline:
per-utterance h5 reads (with an in-memory cache), random converted-speaker
assignment, statistics-based F0 conversion, scaler normalization, fixed
``batch_len`` random-crop / zero-padding with raw-waveform frame alignment,
and -100 ignore-index label padding.  A background thread prefetches
assembled numpy batches.

The crop/pad math is bit-identical to the reference's
(_zero_padding/padding/padding_raw, dataset.py:158-278), which the reference
itself proves frame-exact against the on-the-fly STFT
(test/test_feature_pytorch.py:81-126).
"""

import queue
import random
import threading
import zlib
from pathlib import Path

import numpy as np

from crank_tpu.dsp.f0_utils import convert_f0
from crank_tpu.features.store import calculate_maxflen, read_feature

IGNORE_INDEX = -100


def apply_tfmask(feats, rng, max_bin=27, max_time=100):
    """Time-frequency SpecAugment mask (working implementation of the
    reference's disabled stub, dataset.py:206-217)."""
    flen, dim = feats.shape
    d_mask = rng.randint(1, min(max_bin, dim - 1))
    d_point = rng.randint(0, dim - d_mask)
    t_mask = rng.randint(1, min(max_time, max(2, flen - 1)))
    t_point = rng.randint(0, max(1, flen - t_mask))
    out = np.copy(feats)
    out[:, d_point : d_point + d_mask] = 0.0
    out[t_point : t_point + t_mask] = 0.0
    return out


def create_one_hot(T, N, c, B=-1):
    if B == -1:
        y = np.zeros((T, N), dtype=np.float32)
        y[:, c] = 1
    else:
        y = np.zeros((B, T, N), dtype=np.float32)
        y[:, :, c] = 1
    return y


def padding(x, dlen, batch_len, value=0.0, p=0):
    """Crop (dlen<0, offset p) or right-pad to batch_len (dataset.py:239-258)."""
    if dlen >= 0:
        actual_dlen = batch_len - x.shape[0]
        if actual_dlen != 0:
            if x.ndim == 2:
                x = np.concatenate([x, np.ones((actual_dlen, x.shape[1])) * value])
            else:
                x = np.concatenate([x, np.ones(actual_dlen) * value])
    else:
        x = x[p : p + batch_len]
    if isinstance(value, bool):
        return x.astype(bool, copy=False)
    if isinstance(value, int):
        return x.astype(np.int64, copy=False)
    return x.astype(np.float32, copy=False)


def padding_raw(x, dlen, batch_len, fftl, hop_size, value=0.0, p=0):
    """Crop/pad the raw waveform frame-aligned to the STFT (dataset.py:261-278)."""
    target_length = fftl + hop_size * batch_len - 1
    x = np.asarray(x).squeeze()
    if dlen > 0 or p == 0:
        if len(x) < target_length - fftl:
            x = np.pad(x, int(fftl // 2), mode="reflect")
    else:
        ph = p * hop_size
        hfftl = fftl // 2
        x = np.concatenate([np.zeros(hfftl), x[ph:]])
    if len(x) < target_length:
        x = np.concatenate([x, np.zeros(target_length - len(x))])
    else:
        x = x[:target_length]
    assert len(x) == target_length
    return x.astype(np.float32)


class VCDataset:
    """Per-utterance sample construction (BaseDataset equivalent)."""

    def __init__(self, conf, scp, scaler, phase="train", batch_len=None,
                 cache=None, seed=None):
        self.conf = conf
        self.h5list = list(scp[phase]["feats"].values())
        self.spkrlist = scp["train"]["spkrs"]
        self.scaler = scaler
        self.phase = phase
        self.batch_len = batch_len if batch_len is not None else conf["batch_len"]
        self.rng = random.Random(seed)

        self.features = {conf["input_feat_type"], conf["output_feat_type"],
                         "lcf0", "uv"}
        if "excit" in self.features:
            # derived excitation target [lcf0, uv, cap] — the reference's
            # intent at dataset.py:111-112, which is doubly broken upstream
            # (array-to-string compare + invalid np.hstack call); built
            # after normalization from the stored features
            self.features.discard("excit")
            self.features.add("cap")
        if "mcep" in self.features:
            self.features.add("cap")
        if conf.get("use_raw") or conf.get("use_sinc_conv"):
            # sinc-conv also consumes the frame-aligned raw crop (the
            # reference's dataset gates on use_raw only — its sinc path
            # never received waveforms)
            self.features.add("raw")
        self.spkrdict = dict(zip(self.spkrlist, range(len(self.spkrlist))))
        self.n_spkrs = len(self.spkrdict)
        self.cache = cache if cache is not None else (
            {} if conf.get("cache_dataset") else None
        )
        # precomputed per-utterance labels (pathlib per item is measurably
        # hot in the batch loop)
        self._labels = [
            (str(Path(Path(f).parent.stem) / Path(f).stem),
             str(Path(f).parent.stem))
            for f in self.h5list
        ]

    def __len__(self):
        return len(self.h5list)

    def _read(self, idx):
        """Read + normalize one utterance (cached: normalization is the
        expensive per-item step; crop/cv-speaker randomness stays live,
        improving on the reference cache which freezes the cv speaker,
        conf/default.yml:34 note)."""
        if self.cache is not None and idx in self.cache:
            return self.cache[idx]
        h5f = str(self.h5list[idx])
        raw = {k: read_feature(h5f, ext=k) for k in self.features}
        # keep the unnormalized lcf0 for the statistics-based F0 transform
        # (computed on the raw log-F0 domain, dataset.py:95-100)
        raw["lcf0_raw"] = np.copy(raw["lcf0"])
        if self.scaler is not None:
            ignore = set(self.conf.get("ignore_scaler", [])) | {"uv", "cap"}
            for k in self.features:
                if k not in ignore and k in self.scaler:
                    raw[k] = self.scaler[k].transform(raw[k]).astype(
                        np.float32
                    )
        if self.cache is not None:
            self.cache[idx] = raw
        return raw

    def __getitem__(self, idx):
        sample = dict(self._read(idx))
        sample["flbl"], sample["org_spkr_name"] = self._labels[idx]
        sample["cv_spkr_name"] = self.rng.choice(
            [s for s in self.spkrdict if s != sample["org_spkr_name"]]
        )
        if "excit" in (self.conf["input_feat_type"],
                       self.conf["output_feat_type"]):
            # built before any feature-keyed access: excit may be the
            # *input* type, in which case flen below reads it
            sample["excit"] = np.concatenate(
                [sample["lcf0"], sample["uv"], sample["cap"]], axis=-1
            ).astype(np.float32)
        flen = sample[self.conf["input_feat_type"]].shape[0]
        sample["flen"] = flen
        sample["mask"] = np.ones(flen, dtype=bool)[:, None]
        sample["org_h_onehot"] = create_one_hot(
            flen, self.n_spkrs, self.spkrdict[sample["org_spkr_name"]]
        )
        sample["org_h"] = np.full(
            flen, self.spkrdict[sample["org_spkr_name"]], np.int64
        )
        sample["cv_h_onehot"] = create_one_hot(
            flen, self.n_spkrs, self.spkrdict[sample["cv_spkr_name"]]
        )
        sample["cv_h"] = np.full(
            flen, self.spkrdict[sample["cv_spkr_name"]], np.int64
        )
        # NOTE: cv_lcf0 is computed in the raw log-F0 domain and intentionally
        # left unnormalized, matching the reference exactly (dataset.py:95-100
        # + :146-150; the eval-time path normalizes separately at
        # basetrainer.py:311-320).  Normalization of the feature set itself
        # happens once in _read (cached).
        sample["cv_lcf0"] = convert_f0(
            self.scaler, sample.pop("lcf0_raw"), sample["org_spkr_name"],
            sample["cv_spkr_name"],
        ).astype(np.float32)

        if "mcep" in self.features and not self.conf.get("use_mcep_0th", False):
            sample["mcep_0th"] = sample["mcep"][..., :1]
            sample["mcep"] = sample["mcep"][..., 1:]
        sample = self._zero_padding(sample)
        for m in ("encoder_mask", "decoder_mask", "cycle_encoder_mask",
                  "cycle_decoder_mask"):
            sample[m] = np.copy(sample["mask"])
        del sample["mask"]

        sample["in_feats"] = np.copy(sample[self.conf["input_feat_type"]])
        sample["out_feats"] = np.copy(sample[self.conf["output_feat_type"]])
        # SpecAugment on the network input only (the reconstruction target
        # stays clean); the reference ships this disabled (dataset.py:113-117)
        if self.conf.get("spec_augment") and self.phase == "train":
            for _ in range(self.conf.get("n_spec_augment", 0)):
                sample["in_feats"] = apply_tfmask(sample["in_feats"], self.rng)
        return sample

    def _zero_padding(self, sample):
        blen = self.batch_len
        diff_frames = blen - sample["flen"]
        p = self.rng.choice(range(abs(diff_frames))) if diff_frames < 0 else 0
        for k, v in list(sample.items()):
            if not isinstance(v, np.ndarray):
                continue
            if k == "raw":
                sample[k] = padding_raw(
                    v, diff_frames, blen, self.conf["feature"]["fftl"],
                    self.conf["feature"]["hop_size"], value=0.0, p=p,
                )
            elif k == "mask":
                sample[k] = padding(v, diff_frames, blen, value=False, p=p)
            elif k in ("org_h", "cv_h"):
                sample[k] = padding(v, diff_frames, blen, value=IGNORE_INDEX, p=p)
            else:
                if sample["flen"] != v.shape[0]:
                    sample[k] = padding(v, blen - v.shape[0], blen, value=0.0, p=p)
                else:
                    sample[k] = padding(v, diff_frames, blen, value=0.0, p=p)
        return sample


class VectorizedLoader:
    """Bank-based batch assembly for the training hot loop.

    After the first pass, every utterance's normalized features live in a
    zero-padded contiguous bank [N, Tmax, D] per feature; a batch is then a
    single fancy-index gather per feature plus vectorized mask / label /
    cv-F0 construction — no per-item Python.  Semantics identical to
    VCDataset (same crop distribution, pad values, -100 labels, raw-domain
    cv-F0 transform); measured ~6x faster at the production 50x500 geometry.

    Covers mel/mcep AND the raw/sinc path (precomputed waveform banks, see
    _build_raw_banks); full-utterance eval keeps the per-item loader.
    Banks hold the whole training set in RAM (features, plus waveforms when
    use_raw) — set cache_dataset: false to fall back to the per-item loader
    on corpora that don't fit.
    """

    def __init__(self, dataset: "VCDataset", batch_size, seed=0):
        self.ds = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.L = dataset.batch_len
        self._built = False

    def _build(self):
        ds = self.ds
        n = len(ds)
        feats = sorted(ds.features - {"raw"})
        flens = np.zeros(n, np.int32)
        dims = {}
        raws = []
        for i in range(n):
            r = ds._read(i)
            raws.append(r)
            # lcf0 is always extracted and frame-synchronous with every
            # feature; the input type itself may be derived (excit)
            flens[i] = r["lcf0"].shape[0]
            for k in feats:
                dims[k] = r[k].shape[1]
        tmax = max(int(flens.max()), self.L)
        self.bank = {
            k: np.zeros((n, tmax, dims[k]), np.float32) for k in feats
        }
        self.bank["lcf0_raw"] = np.zeros((n, tmax, 1), np.float32)
        for i, r in enumerate(raws):
            for k in feats:
                self.bank[k][i, : flens[i]] = r[k][: flens[i]]
            self.bank["lcf0_raw"][i, : flens[i]] = r["lcf0_raw"][: flens[i]]
        self.flens = flens
        self._build_raw_banks(raws)
        self.spkr_ids = np.array(
            [ds.spkrdict[s] for _, s in ds._labels], np.int32
        )
        S = ds.n_spkrs
        self.f0_mean = np.array(
            [ds.scaler[s]["lcf0"].mean_[0] for s in ds.spkrlist], np.float32
        )
        self.f0_std = np.array(
            [np.sqrt(ds.scaler[s]["lcf0"].var_[0]) for s in ds.spkrlist],
            np.float32,
        )
        self.eye = np.eye(S, dtype=np.float32)
        self._built = True

    def _build_raw_banks(self, raws):
        """Waveform banks for the raw/sinc path (round-1 gap: raw training
        fell back to the per-item loader). Two precomputed forms reproduce
        padding_raw bit-for-bit:

        * ``raw_bank[i]``: the plain zero-padded waveform — a crop at frame
          offset p>0 is [zeros(fftl//2), x[p*hop:]][:target], i.e. a constant
          zero prefix plus one contiguous gather.
        * ``raw_p0[i]``: the full p==0 / short-utterance output (with its
          reflect padding), taken verbatim from padding_raw.
        """
        ds = self.ds
        if "raw" not in ds.features:
            self.raw_bank = None
            return
        fftl = ds.conf["feature"]["fftl"]
        hop = ds.conf["feature"]["hop_size"]
        L = self.L
        n = len(ds)
        target = fftl + hop * L - 1
        gather_len = target - fftl // 2
        max_off = int(np.maximum(self.flens - L, 0).max())
        self.raw_bank = np.zeros((n, max_off * hop + gather_len), np.float32)
        self.raw_p0 = np.zeros((n, target), np.float32)
        for i, r in enumerate(raws):
            x = np.asarray(r["raw"]).squeeze().astype(np.float32)
            m = min(len(x), self.raw_bank.shape[1])
            self.raw_bank[i, :m] = x[:m]
            dlen = L - self.flens[i]
            self.raw_p0[i] = padding_raw(x, dlen, L, fftl, hop, p=0)
        self._raw_geom = (fftl, hop, target, gather_len)

    def _assemble_raw(self, idxs, p, flen):
        fftl, hop, target, gather_len = self._raw_geom
        B = len(idxs)
        t_idx = (p * hop)[:, None] + np.arange(gather_len)[None, :]
        out = np.concatenate(
            [np.zeros((B, fftl // 2), np.float32),
             self.raw_bank[idxs[:, None], t_idx]], axis=1,
        )
        # padding_raw branch: short utterances or offset 0 use the
        # precomputed reflect-padded form
        use_p0 = (flen <= self.L) | (p == 0)
        out[use_p0] = self.raw_p0[idxs[use_p0]]
        return out

    def __len__(self):
        return len(self.ds) // self.batch_size

    def _sample_plan(self, idxs):
        """Per-batch sampling decisions (crop offset, cv speaker) as [B]
        vectors.  Shared by the host assembly below and the device-resident
        loader (device_loader.py), so both consume the IDENTICAL RNG stream:
        crop offsets uniform over [0, flen - L) when longer (parity with
        _zero_padding's random.choice(range(flen - L))), cv speaker != org."""
        ds, L, B = self.ds, self.L, len(idxs)
        flen = self.flens[idxs]
        over = np.maximum(flen - L, 1)
        p = (self.rng.random(B) * np.where(flen > L, over, 1)).astype(
            np.int64
        ) * (flen > L)
        org = self.spkr_ids[idxs]
        shift = self.rng.integers(1, ds.n_spkrs, size=B)
        cv = (org + shift) % ds.n_spkrs
        return p, org, cv, flen

    def _assemble(self, idxs):
        ds, L, B = self.ds, self.L, len(idxs)
        S = ds.n_spkrs
        p, org, cv, flen = self._sample_plan(idxs)
        t_idx = p[:, None] + np.arange(L)[None, :]          # [B, L]
        valid = t_idx < flen[:, None]                        # [B, L]

        b = {}
        rows = idxs[:, None]
        for k in ds.features - {"raw"}:
            b[k] = self.bank[k][rows, t_idx]
        if self.raw_bank is not None:
            b["raw"] = self._assemble_raw(idxs, p, flen)
        lcf0_raw = self.bank["lcf0_raw"][rows, t_idx]
        b["cv_lcf0"] = (
            (lcf0_raw - self.f0_mean[org][:, None, None])
            / self.f0_std[org][:, None, None]
            * self.f0_std[cv][:, None, None]
            + self.f0_mean[cv][:, None, None]
        ).astype(np.float32)
        mask = valid[:, :, None]
        # padded frames carry cv_lcf0 == 0.0, matching the per-item loader
        # (_zero_padding pads after convert_f0) — without this the affine
        # transform maps the bank's zero padding to a nonzero constant
        b["cv_lcf0"] *= mask
        for m in ("encoder_mask", "decoder_mask", "cycle_encoder_mask",
                  "cycle_decoder_mask"):
            b[m] = mask
        b["org_h"] = np.where(valid, org[:, None], IGNORE_INDEX).astype(
            np.int64
        )
        b["cv_h"] = np.where(valid, cv[:, None], IGNORE_INDEX).astype(
            np.int64
        )
        b["org_h_onehot"] = np.broadcast_to(
            self.eye[org][:, None, :], (B, L, S)
        ).copy()
        b["cv_h_onehot"] = np.broadcast_to(
            self.eye[cv][:, None, :], (B, L, S)
        ).copy()
        if "mcep" in b and not ds.conf.get("use_mcep_0th", False):
            b["mcep_0th"] = b["mcep"][..., :1]
            b["mcep"] = b["mcep"][..., 1:]
        if "excit" in (ds.conf["input_feat_type"],
                       ds.conf["output_feat_type"]):
            b["excit"] = np.concatenate(
                [b["lcf0"], b["uv"], b["cap"]], axis=-1
            )
        b["in_feats"] = np.copy(b[ds.conf["input_feat_type"]])
        b["out_feats"] = np.copy(b[ds.conf["output_feat_type"]])
        if ds.conf.get("spec_augment") and ds.phase == "train":
            for i in range(B):
                for _ in range(ds.conf.get("n_spec_augment", 0)):
                    b["in_feats"][i] = apply_tfmask(b["in_feats"][i], ds.rng)
        b["flen"] = np.minimum(flen, L).astype(np.int32)
        b["flbl"] = [ds._labels[i][0] for i in idxs]
        b["org_spkr_name"] = [ds._labels[i][1] for i in idxs]
        b["cv_spkr_name"] = [ds.spkrlist[c] for c in cv]
        return b

    def __iter__(self):
        if not self._built:
            self._build()

        def make_batches():
            idx = self.rng.permutation(len(self.ds))
            for bi in range(len(self)):
                sl = idx[bi * self.batch_size : (bi + 1) * self.batch_size]
                yield self._assemble(sl)

        yield from threaded_batches(make_batches, maxsize=4)


_STR_KEYS = ("flbl", "org_spkr_name", "cv_spkr_name")

DEVICE_KEYS = (
    "in_feats", "out_feats", "lcf0", "uv", "cv_lcf0", "org_h", "cv_h",
    "org_h_onehot", "cv_h_onehot", "encoder_mask", "decoder_mask",
    "cycle_encoder_mask", "cycle_decoder_mask", "raw",
)


def select_device_batch(batch):
    """Subset of a collated batch that goes to the device/jit boundary."""
    return {k: batch[k] for k in DEVICE_KEYS if k in batch}


def threaded_batches(make_batches, maxsize):
    """Prefetching iterator that survives consumer abandonment.

    When the consuming generator is closed early (the trainer's dev loop
    breaks after one batch every dev interval), the worker thread is
    signalled through ``closed`` and exits — instead of blocking in
    ``q.put`` forever and leaking a thread plus ``maxsize`` collated
    batches per abandoned iteration.
    """
    q = queue.Queue(maxsize=maxsize)
    stop = object()
    closed = threading.Event()

    def put(item):
        while not closed.is_set():
            try:
                q.put(item, timeout=0.25)
                return True
            except queue.Full:
                pass
        return False

    def worker():
        try:
            for item in make_batches():
                if not put(item):
                    return
        finally:
            put(stop)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is stop:
                return
            yield item
    finally:
        closed.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break


def collate(samples):
    """Stack a list of samples into a numpy batch dict."""
    batch = {}
    for k in samples[0]:
        if k in _STR_KEYS:
            batch[k] = [s[k] for s in samples]
        elif k == "flen":
            batch[k] = np.asarray([s[k] for s in samples], np.int32)
        else:
            batch[k] = np.stack([s[k] for s in samples])
    return batch


class DataLoader:
    """Shuffling, prefetching batch iterator over a VCDataset."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 drop_last=True, prefetch=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            sl = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if len(sl) == 0:
                return
            yield sl

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        def make_batches():
            with ThreadPoolExecutor(max_workers=4) as pool:
                for sl in self._index_batches():
                    yield collate(
                        list(pool.map(lambda i: self.dataset[int(i)], sl))
                    )

        yield from threaded_batches(make_batches, maxsize=self.prefetch)


def shard_dataset_for_process(ds, process_index, process_count):
    """Restrict a VCDataset to this process's round-robin slice of the
    utterance list (multi-host input pipeline: each host reads and feeds only
    its own rows of the global batch). Slices are equalized by repeating the
    last utterance so every process yields the same number of batches — a
    shorter host would otherwise deadlock the collective step."""
    if process_count <= 1:
        return ds
    n_local = -(-len(ds.h5list) // process_count)
    ds.h5list = ds.h5list[process_index::process_count]
    ds._labels = ds._labels[process_index::process_count]
    while len(ds.h5list) < n_local:
        ds.h5list.append(ds.h5list[-1])
        ds._labels.append(ds._labels[-1])
    return ds


def get_dataloaders(conf, scp, scaler, flag="train", seed=0,
                    process_index=None, process_count=None):
    """Build train/dev/eval loaders; for reconstruction/eval the geometry is
    recomputed to full utterances (trainer/utils.py:77-106 semantics, with the
    max length rounded up to a 64-frame bucket to keep XLA shapes stable).

    Multi-host: ``batch_size``/``batch_len`` in the returned dict stay GLOBAL
    (they define the jit geometry); each loader yields this process's
    ``local_batch_size`` rows. Train phases sample independent crops per
    process (seed offset); dev/eval/reconstruction shard the utterance list
    round-robin so every utterance is decoded exactly once across hosts."""
    import jax

    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index

    if flag in ("train", "reconstruction"):
        feats = list(scp["train"]["feats"].values()) + list(
            scp["dev"]["feats"].values()
        )
    else:
        feats = list(scp["eval"]["feats"].values())

    batch_len = conf["batch_len"]
    batch_size = conf["batch_size"]
    if flag in ("reconstruction", "eval"):
        token_size = batch_len * batch_size
        batch_len = -(-calculate_maxflen(feats) // 64) * 64
        batch_size = max(1, token_size // batch_len)
        # this value is data-derived (corpus max length), so round it up to
        # a process multiple rather than erroring — ragged final batches
        # are padded downstream anyway (trainer pad_batch_to)
        batch_size = -(-batch_size // pc) * pc

    if batch_size % pc:
        raise ValueError(
            f"global batch_size {batch_size} must divide evenly over "
            f"{pc} processes (set batch_size to a multiple of the host "
            f"count)"
        )
    local_batch_size = batch_size // pc

    spkrs = dict(zip(scp["train"]["spkrs"], range(len(scp["train"]["spkrs"]))))
    loaders = {"spkrs": spkrs, "batch_len": batch_len,
               "batch_size": batch_size,
               "local_batch_size": local_batch_size}
    for phase, shuffle in (("train", True), ("dev", True), ("eval", False)):
        ds = VCDataset(conf, scp, scaler, phase=phase, batch_len=batch_len,
                       # zlib.crc32: stable across runs (builtin hash() is
                       # salted per-process, breaking reproducibility)
                       seed=seed + zlib.crc32(phase.encode()) % 1000
                       + pi * 7919)
        train_sampling = phase == "train" and flag == "train"
        if not train_sampling:
            # deterministic full-utterance phases: disjoint per-host slices
            ds = shard_dataset_for_process(ds, pi, pc)
        if train_sampling and conf.get("cache_dataset", True):
            loaders[phase] = VectorizedLoader(
                ds, batch_size=local_batch_size, seed=seed + pi * 7919
            )
        else:
            loaders[phase] = DataLoader(
                ds, batch_size=local_batch_size, shuffle=shuffle,
                seed=seed + pi * 7919,
                drop_last=(phase == "train" and flag == "train"),
            )
    return loaders
