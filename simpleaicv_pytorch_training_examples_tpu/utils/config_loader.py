"""Work-dir python-config loading.

Parity with the reference entry points' bootstrap
(/root/reference/tools/train_classification_model.py:38-39):
``sys.path.append(work_dir); from train_config import config``. The config is
a plain python class whose body executes at import and instantiates live
objects (model def, datasets, losses, collaters) — this idiom is the
framework's public API and is preserved exactly.
"""

import importlib
import os
import sys


def load_config_from_work_dir(work_dir: str, module_name: str = "train_config"):
    work_dir = os.path.abspath(work_dir)
    if work_dir not in sys.path:
        sys.path.insert(0, work_dir)
    # Force a fresh import if a same-named module from another work dir is
    # already loaded (tests load several experiment dirs in one process).
    if module_name in sys.modules:
        mod = sys.modules[module_name]
        if getattr(mod, "__file__", "") != os.path.join(
                work_dir, module_name + ".py"):
            del sys.modules[module_name]
            mod = importlib.import_module(module_name)
        else:
            mod = importlib.reload(mod)
    else:
        mod = importlib.import_module(module_name)
    return mod.config
