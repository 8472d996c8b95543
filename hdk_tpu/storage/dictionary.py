"""String dictionary: host-side string <-> int32 code mapping.

TPU-native analog of the reference's StringDictionary
(reference: omniscidb/StringDictionary/StringDictionary.h:79,118-135).
Strings never live on the TPU; device columns hold int32 codes and all
string-valued compute is either done in code space (equality, IN, dict
translation) or on the host (LIKE on the dictionary, then code-space
membership on device).  This is the same split the reference uses for
dict-encoded text on GPU.

The reference uses a custom open-addressing map with cached hashes and a
TBB-parallel ``getOrAddBulk``; in Python the interning map is a dict and
bulk paths are vectorized with numpy/pandas factorization.  A C++
extension can replace `bulk_get_or_add` transparently later.
"""

from __future__ import annotations

import threading
from typing import Dict, Iterable, List, Optional

import numpy as np

NULL_CODE = np.int32(np.iinfo(np.int32).min)  # matches inline int32 null


class StringDictionary:
    """Append-only string<->int32 map (codes are dense, starting at 0)."""

    def __init__(self, dict_id: int) -> None:
        self.dict_id = dict_id
        self._strings: List[str] = []
        self._codes: Dict[str, int] = {}
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._strings)

    # -- write path (reference: StringDictionary::getOrAdd / getOrAddBulk) --
    def get_or_add(self, s: Optional[str]) -> int:
        if s is None:
            return int(NULL_CODE)
        code = self._codes.get(s)
        if code is None:
            with self._lock:
                code = self._codes.get(s)
                if code is None:
                    code = len(self._strings)
                    self._strings.append(s)
                    self._codes[s] = code
        return code

    def bulk_get_or_add(self, values: Iterable[Optional[str]]) -> np.ndarray:
        """Vectorized encode; returns int32 codes with NULL_CODE for None."""
        vals = list(values)
        out = np.empty(len(vals), dtype=np.int32)
        codes = self._codes
        strings = self._strings
        with self._lock:
            for i, s in enumerate(vals):
                if s is None:
                    out[i] = NULL_CODE
                    continue
                c = codes.get(s)
                if c is None:
                    c = len(strings)
                    strings.append(s)
                    codes[s] = c
                out[i] = c
        return out

    # -- read path (reference: StringDictionary::getString / getBulk) -------
    def get_string(self, code: int) -> Optional[str]:
        if code == NULL_CODE:
            return None
        return self._strings[code]

    def get_code(self, s: str) -> int:
        """Existing code or -1 (reference: StringDictionary::getIdOfString)."""
        return self._codes.get(s, -1)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """int32 codes -> object array of str/None."""
        arr = np.asarray(self._strings, dtype=object)
        codes = np.asarray(codes)
        out = np.empty(codes.shape, dtype=object)
        valid = codes != NULL_CODE
        out[valid] = arr[codes[valid]]
        out[~valid] = None
        return out

    def all_strings(self) -> List[str]:
        return list(self._strings)

    # -- code-space predicates (reference: StringDictionary::getLike /
    #    getRegexpLike run on the dictionary, result used as an IN-set) -----
    def codes_matching(self, pred) -> np.ndarray:
        """Codes whose string satisfies a host predicate (LIKE/REGEXP)."""
        return np.asarray(
            [c for c, s in enumerate(self._strings) if pred(s)], dtype=np.int32
        )

    def translate_to(self, other: "StringDictionary", add_missing: bool = False) -> np.ndarray:
        """Per-code translation map into ``other`` (reference:
        StringDictionaryProxy translation maps, Execute.h:305-315).
        Missing strings map to NULL_CODE unless ``add_missing``."""
        out = np.empty(len(self._strings), dtype=np.int32)
        for c, s in enumerate(self._strings):
            if add_missing:
                out[c] = other.get_or_add(s)
            else:
                oc = other.get_code(s)
                out[c] = oc if oc >= 0 else NULL_CODE
        return out


class DictionaryRegistry:
    """Owner of all dictionaries, keyed by dict id (reference:
    DataProvider/DictDescriptor.h + ArrowStorage dict management)."""

    def __init__(self) -> None:
        self._dicts: Dict[int, StringDictionary] = {}
        self._next_id = 1
        self._lock = threading.Lock()

    def create(self) -> StringDictionary:
        with self._lock:
            dict_id = self._next_id
            self._next_id += 1
            d = StringDictionary(dict_id)
            self._dicts[dict_id] = d
            return d

    def get(self, dict_id: int) -> StringDictionary:
        return self._dicts[dict_id]
