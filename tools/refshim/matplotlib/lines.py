def __getattr__(n):
    if n.startswith("__"): raise AttributeError(n)
    class _X: pass
    return _X
