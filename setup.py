"""Build driver: packages the Python trees and compiles the native runtime
core (csrc/fa_runtime.cpp -> libfa_runtime.so).

The reference's setup.py compiles six CUDA translation units with a template
fan-out and masquerades as flash-attn 2.8.3 for ecosystem detection
(reference: setup.py:81-98,114-124).  Here the kernels are Pallas (no build
step); only the host-side runtime is native, and the canonical `flash_attn`
package name ships for the same ecosystem-detection purpose.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.command.install import install


class BuildWithNative(build_py):
    def run(self):
        csrc = Path(__file__).parent / "csrc"
        try:
            subprocess.run(["make", "-C", str(csrc)], check=True)
        except (OSError, subprocess.SubprocessError) as e:
            print(f"warning: native runtime build skipped ({e}); "
                  "pure-Python fallback will be used")
        super().run()


class InstallWithDistInfo(install):
    """Emit the `flash_attn-2.8.3.dist-info` masquerade so
    `importlib.metadata.version("flash-attn")` resolves — the ecosystem
    detection contract of the reference (setup.py:114-124): HF
    `is_flash_attn_2_available` and unsloth probe package METADATA, not
    the import."""

    def run(self):
        super().run()
        sys.path.insert(0, str(Path(__file__).parent))
        from flash_attn_v100_tpu.utils.distinfo import write_dist_info
        target = self.install_lib
        if target:
            print("dist-info masquerade:", write_dist_info(target))


setup(cmdclass={"build_py": BuildWithNative,
                "install": InstallWithDistInfo})
