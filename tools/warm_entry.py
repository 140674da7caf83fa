#!/usr/bin/env python3
"""Warm the driver's entry() compile-check program.

The driver compile-checks `__graft_entry__.entry()` single-chip at the
end of every round. Its tiny 2-level program is distinct from the
bench.py 12k program family, so a post-reset cold cache costs the
driver several relay-minutes there too. Run detached after bench:
  (setsid nohup python tools/warm_entry.py > /tmp/warm_entry.log 2>&1 &)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fgfusion_tpu.utils.misc import enable_persistent_compile_cache

enable_persistent_compile_cache(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from __graft_entry__ import entry  # noqa: E402


def main():
    fn, args = entry()
    t0 = time.time()
    jax.block_until_ready(jax.jit(fn)(*args))
    print(f"entry warm done in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
