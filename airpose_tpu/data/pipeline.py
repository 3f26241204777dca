"""Device-side input pipeline.

The reference does per-sample cv2 crop/resize/normalize (and even a full
SMPL-X forward) inside 8-30 DataLoader worker processes
(ref copenet/dsets/aerialpeople.py:98-197, SURVEY.md §3.1 "process
boundary #1"). TPU-first replacement:

  host:    decode JPEG → fixed-size uint8 context windows (+ metadata)
  device:  ONE jitted op per batch — random jitter-crop box, aspect-
           preserving resize-with-pad to 224 (jax.image.scale_and_translate
           with dynamic scale/translation), zero-pad masking, ImageNet
           normalization — all fused by XLA, overlapped with the train step
           by the double-buffering Prefetcher.

Semantics replicate resize_with_pad + the bb encoding
(ref utils/utils.py:214-235, dsets/aerialpeople.py:98-141):
  bb = (crop_center / principal_point − 1, scale),  scale = 224/max(w, h),
  pad is centered and constant-zero *before* normalization.
(Interpolation is jax linear resize vs cv2 bilinear: not bit-identical;
parity is defined on the deterministic eval path — SURVEY.md §7 risks.)
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

_DECODE_POOL = None
_DECODE_POOL_LOCK = threading.Lock()


def decode_pool(num_threads: int = 8) -> ThreadPoolExecutor:
    """Process-wide JPEG-decode thread pool shared by the dataset readers
    (cv2.imread releases the GIL). A persistent pool: spawning/joining one
    per batch measured ~50 ms of pure thread churn at batch 30.

    The pool GROWS to the largest ``num_threads`` ever requested (a new
    executor replaces the old one, which finishes its in-flight work and
    is garbage-collected); smaller requests reuse the existing pool — a
    shared pool cannot shrink for one caller without throttling the
    others."""
    global _DECODE_POOL
    with _DECODE_POOL_LOCK:
        if _DECODE_POOL is None or num_threads > _DECODE_POOL._max_workers:
            _DECODE_POOL = ThreadPoolExecutor(num_threads)
    return _DECODE_POOL


def crop_resize_pad(
    images: jnp.ndarray,   # (B, H, W, 3) uint8 or f32 context windows
    boxes: jnp.ndarray,    # (B, 4) [x0, y0, w, h] float, context coords
    out_size: int = C.CROP_SIZE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop each box, aspect-preserving resize to out_size with centered
    zero padding, ImageNet-normalize. Returns (out (B,S,S,3) f32, scale (B,))."""
    imgs = images.astype(jnp.float32) / 255.0 if images.dtype == jnp.uint8 else images
    B = imgs.shape[0]
    x0, y0, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    scale = out_size / jnp.maximum(w, h)
    # centered pad offsets in output space
    ty = (out_size - scale * h) / 2.0
    tx = (out_size - scale * w) / 2.0

    def one(img, s, tx_, ty_, x0_, y0_):
        return jax.image.scale_and_translate(
            img,
            (out_size, out_size, 3),
            (0, 1, 2),
            jnp.asarray([s, s, 1.0]),
            jnp.asarray([ty_ - s * y0_, tx_ - s * x0_, 0.0]),
            method="linear",
            antialias=False,
        )

    out = jax.vmap(one)(imgs, scale, tx, ty, x0, y0)

    # Zero out the padded border (the reference pads the materialized crop
    # with zeros; sampling the context would leak pixels past the box).
    yy = jnp.arange(out_size, dtype=jnp.float32)
    in_y = (yy[None, :] >= ty[:, None] - 0.5) & (yy[None, :] < ty[:, None] + scale[:, None] * h[:, None] - 0.5)
    in_x = (yy[None, :] >= tx[:, None] - 0.5) & (yy[None, :] < tx[:, None] + scale[:, None] * w[:, None] - 0.5)
    mask = in_y[:, :, None] & in_x[:, None, :]
    out = out * mask[..., None]

    mean = jnp.asarray(C.IMG_NORM_MEAN)
    std = jnp.asarray(C.IMG_NORM_STD)
    return (out - mean) / std, scale


def jitter_crop_boxes(
    key,
    person_box: jnp.ndarray,   # (B, 4) [xmin, ymin, xmax, ymax] person bb, context coords
    context_extent: jnp.ndarray,  # (B, 2) [W, H] of valid context region
    margin=200.0,              # scalar or (B,) per-sample margin
    deterministic: bool = False,
) -> jnp.ndarray:
    """Random jitter-crop like ref dsets/aerialpeople.py:98-127: window =
    person bb ± margin clamped to the frame, each side then pulled in by a
    uniform random offset within its slack. Returns (B, 4) [x0, y0, w, h]."""
    xmin_p, ymin_p, xmax_p, ymax_p = (
        person_box[:, 0], person_box[:, 1], person_box[:, 2], person_box[:, 3]
    )
    Wc, Hc = context_extent[:, 0], context_extent[:, 1]
    margin = jnp.broadcast_to(jnp.asarray(margin, jnp.float32), xmin_p.shape)
    xmin = jnp.maximum(xmin_p - margin, 0.0)
    ymin = jnp.maximum(ymin_p - margin, 0.0)
    xmax = jnp.minimum(xmax_p + margin, Wc)
    ymax = jnp.minimum(ymax_p + margin, Hc)

    if deterministic:
        off = jnp.zeros((person_box.shape[0], 4))
    else:
        u = jax.random.uniform(key, (person_box.shape[0], 4))
        off = u * jnp.stack(
            [xmin_p - xmin, ymin_p - ymin, xmax - xmax_p, ymax - ymax_p], axis=1
        )
    x0 = xmin + off[:, 0]
    y0 = ymin + off[:, 1]
    x1 = xmax - off[:, 2]
    y1 = ymax - off[:, 3]
    return jnp.stack([x0, y0, x1 - x0, y1 - y0], axis=1)


def bb_encoding(
    boxes: jnp.ndarray,     # (B, 4) [x0, y0, w, h]
    principal: jnp.ndarray, # (B, 2) (cx, cy)
    scale: jnp.ndarray,     # (B,)
) -> jnp.ndarray:
    """(B, 3) network conditioning: normalized crop center + scale
    (ref dsets/aerialpeople.py:134-135,200)."""
    center = boxes[:, :2] + boxes[:, 2:] / 2.0
    return jnp.concatenate([center / principal - 1.0, scale[:, None]], axis=1)


class Prefetcher:
    """Host→device prefetch: builds/uploads upcoming batches while the
    current step runs. Replaces DataLoader pin_memory+workers
    (ref copenet_twoview.py:427-443).

    Two modes:
      * ``Prefetcher(iterator)`` — one worker drains an iterator (ordered;
        right for deterministic eval streams);
      * ``Prefetcher.from_factory(make_batch, num_workers=N)`` — N workers
        each call ``make_batch(worker_id)`` repeatedly and push results
        (unordered; right for infinite random training streams, where the
        reference used 8-30 DataLoader worker processes). ``make_batch``
        must be thread-safe across distinct worker_ids.
    """

    def __init__(self, iterator: Iterator = None, sharding=None,
                 depth: int = 2, host_keys=()):
        self._sharding = sharding
        self._host_keys = tuple(host_keys)
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._error = None
        self._threads = []
        self._live_workers = 0
        self._lock = threading.Lock()
        self._stop = False
        if iterator is not None:
            self._start([lambda _wid: None], iterator=iterator)

    @classmethod
    def from_factory(cls, make_batch, num_workers: int = 2, sharding=None,
                     depth: int = 4, host_keys=()) -> "Prefetcher":
        """``host_keys`` names dict-batch entries kept as host numpy arrays
        (e.g. the ``mixed_source`` dispatch tag): uploading them would force
        the consumer into a blocking device→host read per batch just to
        branch on them."""
        self = cls(iterator=None, sharding=sharding,
                   depth=max(depth, num_workers), host_keys=host_keys)
        self._start([make_batch] * num_workers, iterator=None)
        return self

    class _Stopped(Exception):
        """Internal: a sibling worker failed (or close() ran); exit without
        overwriting the recorded error."""

    def _put(self, batch):
        host = {}
        if self._host_keys and isinstance(batch, dict):
            # Shallow-copy before popping host keys: the iterator-based
            # constructor may hand us caller-owned dicts that must not be
            # mutated (the from_factory path always builds fresh ones).
            batch = dict(batch)
            host = {k: batch.pop(k) for k in self._host_keys if k in batch}
        if self._sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.device_put(x, self._sharding), batch
            )
        else:
            batch = jax.tree.map(jnp.asarray, batch)
        if host:
            batch.update(host)
        # Bounded put that respects the stop flag: after one worker errors
        # (or close()), surviving workers must not block forever on a full
        # queue the consumer stopped draining — they would leak, together
        # with their queued batches, for the process lifetime.
        while True:
            if self._stop:
                raise Prefetcher._Stopped()
            try:
                self._q.put(batch, timeout=0.1)
                return
            except queue.Full:
                continue

    def _start(self, factories, iterator):
        self._live_workers = len(factories)

        def iter_worker():
            try:
                for batch in iterator:
                    self._put(batch)
            except Prefetcher._Stopped:
                pass
            except BaseException as e:  # surfaced in __next__, not swallowed
                self._error = e
            finally:
                self._finish_one()

        def factory_worker(wid, make_batch):
            try:
                while True:
                    self._put(make_batch(wid))
            except Prefetcher._Stopped:
                pass
            except BaseException as e:
                self._error = e
            finally:
                self._finish_one()

        for wid, f in enumerate(factories):
            target = (iter_worker if iterator is not None
                      else (lambda w=wid, mb=f: factory_worker(w, mb)))
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)

    def _finish_one(self):
        with self._lock:
            self._live_workers -= 1
            # the sentinel goes in when ANY worker errors (so the consumer
            # learns promptly while siblings still produce) or when all
            # workers drained cleanly; an error also stops the siblings —
            # the consumer is about to raise and will never drain them
            if self._error is not None:
                self._stop = True
            if self._live_workers == 0 or self._error is not None:
                # best-effort: with the queue full the sentinel is dropped
                # rather than blocking an exiting worker; __next__ also
                # polls worker/error state so nothing is lost
                try:
                    self._q.put_nowait(self._done)
                except queue.Full:
                    pass

    def close(self):
        """Stop all workers and let them exit promptly (they observe the
        flag on their next bounded put). Safe to call more than once; the
        consumer can keep draining already-queued batches."""
        self._stop = True

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                item = self._q.get(timeout=0.5)
            except queue.Empty:
                # sentinel may have been dropped against a full queue that
                # has since drained — fall back to polling worker state
                with self._lock:
                    if self._error is not None:
                        raise RuntimeError(
                            "Prefetcher worker failed") from self._error
                    if self._live_workers == 0 and self._q.empty():
                        raise StopIteration
                continue
            if item is not self._done:
                return item
            if self._error is not None:
                raise RuntimeError("Prefetcher worker failed") from self._error
            with self._lock:
                if self._live_workers == 0:
                    raise StopIteration
            # a spurious sentinel (raced with a late error-set): keep going


def finish_batch(
    host_batch: Dict,
    key,
    deterministic: bool = False,
    margin: float = 200.0,
    out_size: int = C.CROP_SIZE,
) -> Dict:
    """Device-side completion of a host batch (jit-friendly): jitter-crop →
    resize-with-pad → normalize, and compute the bb conditioning. Folds the
    view axis into the batch for the image ops. Consumes the fields emitted
    by the dataset readers (context, context_extent, context_origin,
    person_box, intr) and returns the canonical train-batch layout."""
    ctx = host_batch["context"]
    B, V = ctx.shape[:2]
    flat = lambda a: a.reshape((B * V,) + a.shape[2:])

    # context_scale: integer factor by which an oversized window was
    # downsampled into the fixed context buffer (1 = native resolution)
    f = flat(jnp.asarray(host_batch.get(
        "context_scale", np.ones(ctx.shape[:2], np.float32))))
    boxes = jitter_crop_boxes(
        key,
        flat(jnp.asarray(host_batch["person_box"])),
        flat(jnp.asarray(host_batch["context_extent"])),
        margin=margin / f,
        deterministic=deterministic,
    )
    images, scale_ctx = crop_resize_pad(flat(jnp.asarray(ctx)), boxes, out_size)
    # geometry bookkeeping is in FRAME pixels
    scale = scale_ctx / f

    intr = jnp.asarray(host_batch["intr"])
    principal = flat(intr[..., :2, 2])
    origin = flat(jnp.asarray(host_batch["context_origin"]))
    frame_boxes = (boxes * f[:, None]).at[:, :2].add(origin)
    bb = bb_encoding(frame_boxes, principal, scale)

    batch = {
        k: jnp.asarray(v)
        for k, v in host_batch.items()
        if k not in ("context", "context_extent", "context_origin",
                     "person_box", "context_scale")
    }
    batch["images"] = images.reshape(B, V, out_size, out_size, 3)
    batch["bb"] = bb.reshape(B, V, 3)
    # Crop-frame keypoints (centered at 0, scaled): kp_crop = s·(uv − c)
    # (ref dsets/copenet_real.py:226-227) — used by the single-view real
    # losses.
    if "gt_j2d_conf" in batch:
        kp = batch["gt_j2d_conf"]
        center = (frame_boxes[:, :2] + frame_boxes[:, 2:] / 2.0).reshape(B, V, 1, 2)
        uv_crop = scale.reshape(B, V, 1, 1) * (kp[..., :2] - center)
        batch["gt_j2d_crop_conf"] = jnp.concatenate(
            [uv_crop, kp[..., 2:]], axis=-1
        )
    if "gt_j2d" in batch:
        # crop-frame GT keypoints for the weak-cam families
        # (same convention: kp_crop = s·(uv − crop_center))
        center = (frame_boxes[:, :2] + frame_boxes[:, 2:] / 2.0).reshape(B, V, 1, 2)
        batch["gt_j2d_crop"] = (
            scale.reshape(B, V, 1, 1) * (batch["gt_j2d"][..., :2] - center)
        )
    return batch
