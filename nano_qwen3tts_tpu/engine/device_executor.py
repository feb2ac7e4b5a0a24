"""Single-thread executor for all blocking device work.

The engine loop and the codec DecodeWorker both push blocking JAX calls off
the event loop. Sharing ONE worker thread serializes them — there is one
device anyway, and concurrent JAX dispatch from multiple Python threads can
deadlock remote-attached backends (observed with the TPU relay used for
benching).
"""

from concurrent.futures import ThreadPoolExecutor

DEVICE_EXECUTOR = ThreadPoolExecutor(max_workers=1, thread_name_prefix="device")

# Separate thread for BLOCKING device->host fetches (np.asarray on arrays
# whose transfer is already in flight). Fetching is safe off the dispatch
# thread — only concurrent *dispatch* deadlocks remote-attached backends —
# and a fetch through a high-latency relay would otherwise hold the device
# thread for a full round trip, stalling the engine loop behind codec
# decodes (measured: 8-CCU serving RTF 0.97 -> 0.5 by splitting).
FETCH_EXECUTOR = ThreadPoolExecutor(max_workers=1, thread_name_prefix="fetch")
