"""Streaming (video) inference with double-buffered host->TPU transfer.

BASELINE.json stretch config: a second static-shape compiled program at 736x736
plus a depth-K in-flight pipeline.  JAX dispatch is asynchronous, so keeping K
frames submitted-but-not-fetched overlaps the host upload + device compute of
frame i+1..i+K with the host-side consumption of frame i — classic double
buffering without explicit DMA management (the XLA runtime owns the transfer
queues; SURVEY.md §5.7 per-resolution program caching).
"""

from collections import deque



class StreamingPipeline:
    """Wraps an InferencePipeline with a bounded in-flight frame queue."""

    def __init__(self, pipeline, depth=2):
        assert depth >= 1
        self.pipeline = pipeline
        self.depth = depth
        self._inflight = deque()

    def submit(self, image):
        """Dispatch one frame (B, H, W, 3); non-blocking."""
        self._inflight.append(self.pipeline.run_device(image))

    def ready(self):
        return len(self._inflight) > self.depth

    def retrieve(self):
        """Fetch the oldest completed frame's detections (host list of dicts)."""
        out = self._inflight.popleft()
        return self.pipeline.postprocess.to_host_list(out)

    def drain(self):
        while self._inflight:
            yield self.retrieve()

    def __call__(self, frames):
        """Generator: frames iterable of (B, H, W, 3) -> per-frame detections,
        with `depth` frames pipelined."""
        for frame in frames:
            self.submit(frame)
            if self.ready():
                yield self.retrieve()
        yield from self.drain()
