"""Shared delivery registry for the message_filters stub."""

_synchronizers = []


def reset():
    _synchronizers.clear()


def register(sync):
    _synchronizers.append(sync)


def deliver(topic, msg):
    for s in _synchronizers:
        s._deliver(topic, msg)
