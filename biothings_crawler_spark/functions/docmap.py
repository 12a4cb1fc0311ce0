"""Document-transform helpers — the TransformDoc capability surface.

The reference exposes a dict subclass with rename/delete/transform
helpers and touched-key tracking (crawler/upload/tdoc.py:5-139); every
uploader's ``transform_doc`` is written against it. This is a fresh
implementation of that capability for use *inside* Arrow-batched UDF
bodies (the per-doc transform is inherently row-wise dict surgery; the
batching and everything around it stays vectorized).

Semantics reproduced exactly (test-pinned):
  * non-str keys are coerced to str at wrap time (tdoc.py:12-15)
  * ``touched`` records keys written after wrap; ``prune_untouched``
    keeps only those (tdoc.py:88-93 delete_unused_keys)
  * rename moves values (old key removed), KeyError optional
    (tdoc.py:32-54)
  * apply_kv pops the old key and merges the mapping returned by the
    function (tdoc.py:95-117 transform_keys_values)
  * apply_v replaces values in place (tdoc.py:119-139 transform_values)
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping


class DocTransform:
    """A plain dict plus touched-key tracking and transform helpers."""

    def __init__(self, data: Mapping):
        self.data: dict = {}
        for k, v in data.items():
            self.data[k if isinstance(k, str) else str(k)] = v
        self.touched: set[str] = set()

    # -- write paths (all record touches) --------------------------------
    def __setitem__(self, key: str, value: Any) -> None:
        self.data[key] = value
        self.touched.add(key)

    def __getitem__(self, key: str) -> Any:
        return self.data[key]

    def __contains__(self, key: str) -> bool:
        return key in self.data

    def get(self, key: str, default: Any = None) -> Any:
        return self.data.get(key, default)

    def pop(self, key: str, *default: Any) -> Any:
        return self.data.pop(key, *default)

    def merge(self, other: Mapping[str, Any]) -> "DocTransform":
        for k, v in other.items():
            self[k] = v
        return self

    # -- transform helpers -------------------------------------------------
    def rename(self, mapping: Mapping[str, str], missing_ok: bool = False) -> "DocTransform":
        for old, new in mapping.items():
            if old not in self.data:
                if missing_ok:
                    continue
                raise KeyError(old)
            self[new] = self.data.pop(old)
        return self

    def delete(self, keys: Iterable[str], missing_ok: bool = True) -> "DocTransform":
        for k in keys:
            if k in self.data:
                del self.data[k]
            elif not missing_ok:
                raise KeyError(k)
        return self

    def keep_only(self, keys: Iterable[str]) -> "DocTransform":
        keep = set(keys)
        for k in [k for k in self.data if k not in keep]:
            del self.data[k]
        return self

    def prune_untouched(self) -> "DocTransform":
        return self.keep_only(self.touched)

    def apply_kv(
        self,
        mapping: Mapping[str, Callable[[Any], Mapping[str, Any]]],
        missing_ok: bool = False,
    ) -> "DocTransform":
        for old, fn in mapping.items():
            if old not in self.data:
                if missing_ok:
                    continue
                raise KeyError(old)
            self.merge(fn(self.data.pop(old)))
        return self

    def apply_v(
        self,
        mapping: Mapping[str, Callable[[Any], Any]],
        missing_ok: bool = False,
    ) -> "DocTransform":
        for key, fn in mapping.items():
            if key not in self.data:
                if missing_ok:
                    continue
                raise KeyError(key)
            self[key] = fn(self.data[key])
        return self

    def sorted_dict(self) -> dict:
        """Top-level key sort — the reference's emit form
        (upload/helper.py:25, immport.py:133)."""
        return dict(sorted(self.data.items()))
