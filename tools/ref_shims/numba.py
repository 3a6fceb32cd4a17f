"""numba stand-in: the reference's vendored ensemble_boxes only uses
@jit as a decoration (ensemble_boxes_wbf.py:7); a pass-through keeps the
pure-Python path, which is plenty for the A/B harness's tiny val sets."""


def jit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def wrap(fn):
        return fn

    return wrap


njit = jit
