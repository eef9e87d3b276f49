"""Host-side async batch prefetch.

The reference feeds the model image-by-image from the dataloader thread
(num_workers=0 everywhere, reference stage_3.py:30); on TPU the host must
decode/resize and stage the NEXT batch while the device computes the
current one, or the chip idles on input. A small thread pool decodes
images and a staging thread device_puts ahead of consumption.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import numpy as np

from alpha_yolo_quant_tpu.data.coco import (
    CocoSample, CocoValDataset, load_image_square,
)


def prefetch_batches(ds: CocoValDataset, batch_size: int, size: int = 640,
                     depth: int = 2, decode_workers: int = 4,
                     device_put: bool = True
                     ) -> Iterator[Tuple[object, List[Optional[CocoSample]]]]:
    """Yield (images, samples) like data.coco.batches, but with image
    decode parallelized and up to `depth` batches staged on device ahead
    of the consumer."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def producer():
        with ThreadPoolExecutor(max_workers=decode_workers) as pool:
            buf_f, buf_s = [], []

            def flush():
                imgs = np.stack([f.result() for f in buf_f])
                batch = (jax.device_put(imgs) if device_put else imgs,
                         list(buf_s))
                q.put(batch)

            for s in ds.samples:
                buf_f.append(pool.submit(load_image_square, s.path, size))
                buf_s.append(s)
                if len(buf_f) == batch_size:
                    flush()
                    buf_f, buf_s = [], []
            if buf_f:
                while len(buf_f) < batch_size:
                    buf_f.append(buf_f[-1])
                    buf_s.append(None)
                flush()
        q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item
    t.join()
