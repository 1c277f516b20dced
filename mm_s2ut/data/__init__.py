from mm_s2ut.data.dictionary import Dictionary, UnitDictionary  # noqa: F401
