import os
import sys

# `python -m fccf_pcr_tpu` imports the package BEFORE cli.main() runs, so
# --device cpu must be honored here, before anything else touches jax:
# this container ships JAX_PLATFORMS=axon plus a sitecustomize that
# registers a remote-TPU plugin, and if the platform list still contains
# the plugin when the package is imported, the plugin backend can
# initialize at first dispatch — which hangs indefinitely when the TPU
# tunnel relay is down. Setting the env var AND the config before the
# package import is the verified off switch (tests/conftest.py uses the
# same pattern; measured: package-import-then-update hangs with a dead
# relay, update-then-import does not).
if "--device" in sys.argv:
    i = sys.argv.index("--device")
    if i + 1 < len(sys.argv) and sys.argv[i + 1] == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

from .cli import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
