"""Minimal rospy stand-in for smoke-testing the ROS nodes without a ROS
install (VERDICT r1 item 7). spin() plays back a pre-loaded message
sequence into the registered subscribers, then returns — enough to drive
each node's subscribe -> track -> save-trajectory path end-to-end."""

_subs = {}          # topic -> [callbacks]
_published = []     # (topic, msg)
PLAYBACK = []       # [(topic, msg)] set by the test before main()


def reset():
    global PLAYBACK
    _subs.clear()
    _published.clear()
    PLAYBACK = []


def init_node(name, **kw):
    pass


class Subscriber:
    def __init__(self, topic, msg_type, callback=None, queue_size=None):
        self.topic = topic
        if callback is not None:
            _subs.setdefault(topic, []).append(callback)


class Publisher:
    def __init__(self, topic, msg_type, queue_size=None):
        self.topic = topic

    def publish(self, msg):
        _published.append((self.topic, msg))


def spin():
    import message_filters_registry as mf

    for topic, msg in PLAYBACK:
        for cb in _subs.get(topic, []):
            cb(msg)
        mf.deliver(topic, msg)


def published():
    return list(_published)
