"""sensor_msgs.msg stand-in."""


class _Stamp:
    def __init__(self, t):
        self._t = float(t)

    def to_sec(self):
        return self._t


class _Header:
    def __init__(self, t):
        self.stamp = _Stamp(t)


class Image:
    def __init__(self, data=None, t=0.0):
        self.data = data
        self.header = _Header(t)
