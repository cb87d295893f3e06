"""Plugin loading (SURVEY O29, config/RestructureConfig.kt:224-231).

The reference reflectively instantiates user classes (path factories,
format factories, compression factories) named in config, from JARs in a
plugin directory.  The Python-native equivalent: a plugin spec
``"package.module:ClassOrFactory"`` resolved via importlib, optionally
called with a properties dict — the standard entry-point convention.

Built-in names resolve without dots: ``csv``/``json`` formats,
``gzip``/``none`` compression, ``formatted`` path factory — mirroring the
reference's name-or-class config values (CommandLineArgs.kt:47-75).
"""

from __future__ import annotations

import importlib
from typing import Any


def load_plugin(spec: str, properties: dict | None = None, builtins: dict | None = None) -> Any:
    """Resolve a plugin: a builtin short name, or ``module:attr`` /
    dotted-path spec.  Classes/callables are instantiated with
    ``properties`` (if they accept it), mirroring
    ``String.toPluginInstance(properties)``."""
    builtins = builtins or {}
    if spec in builtins:
        return builtins[spec]
    if ":" in spec:
        mod_name, attr = spec.split(":", 1)
    elif "." in spec:
        mod_name, attr = spec.rsplit(".", 1)
    else:
        raise ValueError(
            f"Unknown plugin {spec!r}: not a builtin ({sorted(builtins)}) "
            f"and not a module:attr path"
        )
    mod = importlib.import_module(mod_name)
    obj = getattr(mod, attr)
    if callable(obj):
        # Decide the calling convention from the SIGNATURE, not by
        # catching TypeError — a TypeError raised INSIDE the plugin's
        # constructor must propagate, not silently retry without the
        # user's configured properties.
        import inspect

        try:
            takes_props = bool(inspect.signature(obj).parameters)
        except (TypeError, ValueError):  # builtins without signatures
            takes_props = True
        return obj(properties or {}) if takes_props else obj()
    return obj
