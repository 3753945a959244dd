"""message_filters stand-in: exact-enough ApproximateTimeSynchronizer —
buffers one message per topic and fires when every slot within `slop` is
filled."""

import message_filters_registry as registry


class Subscriber:
    def __init__(self, topic, msg_type):
        self.topic = topic


class ApproximateTimeSynchronizer:
    def __init__(self, subs, queue_size, slop):
        self.topics = [s.topic for s in subs]
        self.slop = slop
        self.pending = {}
        self.callbacks = []
        registry.register(self)

    def registerCallback(self, cb):
        self.callbacks.append(cb)

    def _deliver(self, topic, msg):
        if topic not in self.topics:
            return
        self.pending[topic] = msg
        if len(self.pending) == len(self.topics):
            stamps = [self.pending[t].header.stamp.to_sec()
                      for t in self.topics]
            if max(stamps) - min(stamps) <= self.slop:
                msgs = [self.pending[t] for t in self.topics]
                for cb in self.callbacks:
                    cb(*msgs)
            self.pending = {}
