import os
import sys

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4): must be set
# before jax is imported anywhere. The environment registers a tunneled
# TPU PJRT plugin ("axon") from sitecustomize when PALLAS_AXON_POOL_IPS is
# set; clearing it keeps unit tests off the (slow, single-chip) tunnel.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sitecustomize may have already imported jax and pinned jax_platforms to
# the axon plugin; override back to CPU explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
