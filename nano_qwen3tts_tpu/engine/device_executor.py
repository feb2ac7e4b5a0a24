"""Single-thread executor for all blocking device work.

The engine loop and the codec DecodeWorker both push blocking JAX calls off
the event loop. Sharing ONE worker thread serializes them — there is one
device anyway, and concurrent JAX dispatch from multiple Python threads can
deadlock remote-attached backends (observed with the TPU relay used for
benching).
"""

from concurrent.futures import ThreadPoolExecutor

DEVICE_EXECUTOR = ThreadPoolExecutor(max_workers=1, thread_name_prefix="device")
