"""Persistent TPU job worker (dev tool).

The axon TPU tunnel costs ~2 minutes of session setup per Python process.
This worker keeps one process alive: it polls /tmp/tpu_jobs/job_*.py,
executes each in a shared namespace (so compiled executables and imports
persist across jobs), and writes stdout+traceback to job_*.out (.done
marker when finished).
"""

import glob
import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

# warm the session
import numpy as np  # noqa
import jax  # noqa
import jax.numpy as jnp  # noqa

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

print("worker ready, devices:", jax.devices(), flush=True)
open(os.path.join(JOBS, "READY"), "w").write("ok")

namespace = {"np": np, "jax": jax, "jnp": jnp}

while True:
    jobs = sorted(glob.glob(os.path.join(JOBS, "job_*.py")))
    for job in jobs:
        done = job[:-3] + ".done"
        out = job[:-3] + ".out"
        if os.path.exists(done):
            continue
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        try:
            code = open(job).read()
            exec(compile(code, job, "exec"), namespace)
        except BaseException:
            traceback.print_exc(file=buf)
        finally:
            sys.stdout = old
        open(out, "w").write(buf.getvalue())
        open(done, "w").write("1")
        print(f"finished {job}", flush=True)
    time.sleep(0.5)
