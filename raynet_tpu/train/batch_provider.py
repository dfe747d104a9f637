"""Prefetching batch providers.

Parity: raynet/train_network/batch_provider.py (threaded producer filling a
cyclic sample cache, random-index batch sampling, ready() blocking until the
first full pass) and raynet_batch_provider.py's RayNet batch assembly — with
the broken multiprocessing variant replaced by a WORKING multi-threaded
producer pool (the reference's workers wrote to non-shared memory and never
produced anything, SURVEY.md §2.4).
"""
import threading

import numpy as np


class BatchProvider:
    """Producer thread keeps a cyclic cache of samples; batches are random
    cache slices. Iterable (infinite) for training loops."""

    def __init__(
        self, dataset, sample_generator, cache_size=500, batch_size=32,
        n_workers=1,
    ):
        self._dataset = dataset
        self._sg = sample_generator
        self._batch_size = batch_size

        shapes = sample_generator.input_shapes
        out_shapes = sample_generator.output_shapes
        self._inputs = [
            np.empty((cache_size,) + tuple(s), dtype=np.float32)
            for s in shapes
        ]
        self._outputs = [
            np.empty((cache_size,) + tuple(s), dtype=np.float32)
            for s in out_shapes
        ]
        self._cache_size = cache_size
        self._filled = 0
        self._write_idx = 0
        self._lock = threading.RLock()
        self._stop = threading.Event()
        self._ready = threading.Event()
        self._error = None

        self._producers = [
            threading.Thread(target=self._produce, daemon=True)
            for _ in range(n_workers)
        ]
        for p in self._producers:
            p.start()

    def _split_parts(self, value, n_parts):
        """A sample's X/y may be a list of per-input arrays or one stacked
        ndarray whose first axis enumerates the inputs (the Hartmann
        generator returns the latter)."""
        if isinstance(value, (list, tuple)):
            return value
        if n_parts == 1:
            return [value]
        return list(value)

    def _produce(self):
        try:
            while not self._stop.is_set():
                sample = self._sg.get_sample(self._dataset)
                if sample.X is None or sample.y is None:
                    continue
                xs = self._split_parts(sample.X, len(self._inputs))
                ys = self._split_parts(sample.y, len(self._outputs))
                with self._lock:
                    i = self._write_idx
                    for buf, x in zip(self._inputs, xs):
                        buf[i] = x
                    for buf, y in zip(self._outputs, ys):
                        buf[i] = y
                    self._write_idx = (i + 1) % self._cache_size
                    self._filled = min(self._filled + 1, self._cache_size)
                    if self._filled == self._cache_size:
                        self._ready.set()
        except BaseException as e:  # propagate instead of hanging consumers
            self._error = e
            self._ready.set()

    def _check_error(self):
        if self._error is not None:
            raise RuntimeError("batch producer failed") from self._error

    def ready(self, timeout=None):
        """Block until the cache has been filled once."""
        ok = self._ready.wait(timeout)
        self._check_error()
        return ok

    def stop(self):
        self._stop.set()

    def get_batch(self):
        self.ready()
        self._check_error()
        with self._lock:
            idxs = np.random.randint(0, self._filled, self._batch_size)
            X = [buf[idxs].copy() for buf in self._inputs]
            y = [buf[idxs].copy() for buf in self._outputs]
        return X, y

    def __iter__(self):
        return self

    def __next__(self):
        return self.get_batch()


class RayNetBatchProvider:
    """Assembles whole-batch RayNet training tensors from one scene.

    Batch layout (parity: raynet_batch_provider.py:26-60):
        X: (views, B, D) + patch_shape
        points: (B, D, 4)
        ray_voxel_indices: (B, M, 3) int32
        ray_voxel_count: (B,) int32
        y: (B, M) one-hot over visited voxels
        camera_centers: (B, 4)
        bbox: (6,) of the batch's single scene
    """

    def __init__(self, dataset, sample_generator):
        self._dataset = dataset
        self._sg = sample_generator

    def get_batch_of_rays(self, batch_size):
        gp = self._sg.generation_params
        views = gp.neighbors + 1
        D = gp.depth_planes
        M = gp.max_number_of_marched_voxels
        ps = tuple(gp.patch_shape)

        X = np.empty((views, batch_size, D) + ps, dtype=np.float32)
        points = np.empty((batch_size, D, 4), dtype=np.float32)
        indices = np.zeros((batch_size, M, 3), dtype=np.int32)
        counts = np.zeros((batch_size,), dtype=np.int32)
        y = np.zeros((batch_size, M), dtype=np.float32)
        centers = np.empty((batch_size, 4), dtype=np.float32)

        scene_idx = None
        i = 0
        while i < batch_size:
            s = self._sg.get_sample(self._dataset)
            if s.X is None:
                continue
            if scene_idx is None:
                scene_idx = s.scene_idx
            assert s.scene_idx == scene_idx, (
                "a RayNet batch must come from a single scene"
            )
            X[:, i] = s.X
            points[i] = s.points
            indices[i] = s.ray_voxel_indices
            counts[i] = s.Nr
            y[i] = s.y
            centers[i] = s.camera_center[:, 0]
            i += 1

        scene = self._dataset.get_scene(scene_idx)
        return {
            "X": X,
            "points": points,
            "ray_voxel_indices": indices,
            "ray_voxel_count": counts,
            "y": y,
            "camera_centers": centers,
            "bbox": scene.bbox.reshape(-1).astype(np.float32),
            "scene_idx": scene_idx,
        }


# Backwards-compatible aliases mirroring the reference's class names.
SingleThreadRayNetBatchProvider = RayNetBatchProvider


class MultiThreadRayNetBatchProvider(RayNetBatchProvider):
    """Thread-pool batch assembly with GENUINELY concurrent draws.

    The reference's multiprocessing variant was broken by construction (its
    workers wrote to non-shared memory, raynet_batch_provider.py:147-245);
    round 1's thread version held one lock around the whole draw and was
    serial in practice. Here the batch's (scene, image window) is pinned
    from the shared generator's schedule up front — preserving the
    single-scene batch invariant — and each worker draws rays with its OWN
    generator clone (independent RNG, no shared mutable state), so the
    expensive per-sample work (patch gathers, voxel traversal) runs outside
    any lock. The shared schedule is advanced afterward by the number of
    accepted draws, exactly as the serial provider would have.
    """

    def __init__(self, dataset, sample_generator, n_workers=4, seed=1234):
        super().__init__(dataset, sample_generator)
        self._n_workers = n_workers
        self._worker_sgs = [
            self._clone_generator(seed + i) for i in range(n_workers)
        ]

    def _clone_generator(self, seed):
        import copy

        sg = copy.copy(self._sg)
        sg._rng = np.random.RandomState(seed)
        return sg

    def get_batch_of_rays(self, batch_size):
        sg = self._sg
        scene_idx = sg._scenes_range[sg._scene_idx]
        scene = self._dataset.get_scene(scene_idx)

        lock = threading.Lock()
        samples = []
        errors = []

        def worker(wsg):
            # Sync the clone's positional state with the shared schedule so
            # _draw_img_idx sees the current image window.
            wsg._scene_idx = sg._scene_idx
            wsg._img_idx = sg._img_idx
            try:
                while True:
                    with lock:
                        if len(samples) >= batch_size or errors:
                            return
                    img_idx = wsg._draw_img_idx(scene, wsg._rng)
                    s = wsg._get_sample(scene, scene_idx, img_idx)
                    if s.X is None or s.y is None:
                        continue
                    with lock:
                        if len(samples) < batch_size:
                            samples.append(s)
            except BaseException as e:
                with lock:
                    errors.append(e)

        threads = [
            threading.Thread(target=worker, args=(wsg,))
            for wsg in self._worker_sgs
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise RuntimeError("batch worker failed") from errors[0]

        # Advance the shared generator's schedule by the accepted draws.
        for _ in range(len(samples)):
            sg._rays_cnt += 1
            sg._advance(scene)

        return self._assemble(samples[:batch_size])

    def _assemble(self, samples):
        gp = self._sg.generation_params
        views = gp.neighbors + 1
        b = len(samples)
        D = gp.depth_planes
        M = gp.max_number_of_marched_voxels
        ps = tuple(gp.patch_shape)

        X = np.empty((views, b, D) + ps, dtype=np.float32)
        points = np.empty((b, D, 4), dtype=np.float32)
        indices = np.zeros((b, M, 3), dtype=np.int32)
        counts = np.zeros((b,), dtype=np.int32)
        y = np.zeros((b, M), dtype=np.float32)
        centers = np.empty((b, 4), dtype=np.float32)
        scene_idx = samples[0].scene_idx
        for i, s in enumerate(samples):
            X[:, i] = s.X
            points[i] = s.points
            indices[i] = s.ray_voxel_indices
            counts[i] = s.Nr
            y[i] = s.y
            centers[i] = s.camera_center[:, 0]
        scene = self._dataset.get_scene(scene_idx)
        return {
            "X": X,
            "points": points,
            "ray_voxel_indices": indices,
            "ray_voxel_count": counts,
            "y": y,
            "camera_centers": centers,
            "bbox": scene.bbox.reshape(-1).astype(np.float32),
            "scene_idx": scene_idx,
        }
