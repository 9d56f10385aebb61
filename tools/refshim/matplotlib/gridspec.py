def __getattr__(n):
    class _X: pass
    return _X
