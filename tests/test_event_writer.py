"""Event writer: files must be readable by stock TensorBoard tooling."""
import numpy as np
import pytest

from transformertts_tpu.utils.event_writer import EventWriter, crc32c
from transformertts_tpu.utils.logging_utils import SummaryManager


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros
    assert crc32c(b'\x00' * 32) == 0x8A9136AA
    assert crc32c(b'123456789') == 0xE3069283


def _load_events(logdir):
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)
    files = sorted(str(p) for p in logdir.glob('events.out.tfevents.*'))
    events = []
    for f in files:
        events.extend(EventFileLoader(f).Load())
    return events


def _scalar_of(value):
    # the TB loader migrates simple_value into a float tensor
    if value.HasField('tensor') and value.tensor.float_val:
        return value.tensor.float_val[0]
    return value.simple_value


def test_scalars_round_trip(tmp_path):
    w = EventWriter(tmp_path)
    w.add_scalar('loss/total', 1.5, step=10)
    w.add_scalar('loss/total', 0.5, step=20)
    w.close()
    events = _load_events(tmp_path)
    scalars = [(e.step, v.tag, _scalar_of(v))
               for e in events for v in getattr(e.summary, 'value', [])]
    assert (10, 'loss/total', 1.5) in scalars
    assert (20, 'loss/total', 0.5) in scalars


def _load_raw_events(logdir):
    """Parse records with the Event proto directly (no data_compat
    migration), verifying the TFRecord framing byte-for-byte."""
    import struct
    from tensorboard.compat.proto.event_pb2 import Event
    from transformertts_tpu.utils.event_writer import _masked_crc
    events = []
    for f in sorted(logdir.glob('events.out.tfevents.*')):
        blob = f.read_bytes()
        off = 0
        while off < len(blob):
            header = blob[off:off + 8]
            (length,) = struct.unpack('<Q', header)
            (hcrc,) = struct.unpack('<I', blob[off + 8:off + 12])
            assert hcrc == _masked_crc(header)
            data = blob[off + 12:off + 12 + length]
            (dcrc,) = struct.unpack('<I',
                                    blob[off + 12 + length:off + 16 + length])
            assert dcrc == _masked_crc(data)
            events.append(Event.FromString(data))
            off += 16 + length
    return events


def test_histogram_audio_text_round_trip(tmp_path):
    w = EventWriter(tmp_path)
    w.add_histogram('durs', np.asarray([1.0, 2.0, 2.0, 3.0]), step=1)
    w.add_audio('wav', np.sin(np.linspace(0, 100, 2205)), 22050, step=1)
    w.add_text('cfg', 'hello world', step=1)
    w.close()
    events = _load_raw_events(tmp_path)
    assert events[0].file_version == 'brain.Event:2'
    tags = [v.tag for e in events for v in getattr(e.summary, 'value', [])]
    assert 'durs' in tags and 'wav' in tags and 'cfg' in tags
    for e in events:
        for v in getattr(e.summary, 'value', []):
            if v.tag == 'durs':
                assert v.histo.num == 4.0
                assert v.histo.sum == 8.0
            if v.tag == 'wav':
                assert v.audio.sample_rate == 22050
                assert v.audio.encoded_audio_string[:4] == b'RIFF'
            if v.tag == 'cfg':
                assert v.tensor.string_val[0] == b'hello world'
                assert v.metadata.plugin_data.plugin_name == 'text'


def test_summary_manager(tmp_path):
    config = {'train_images_plotting_frequency': 1}
    sm = SummaryManager(model=None, log_dir=tmp_path, config=config)
    sm.display_loss({'loss': 2.0, 'mel': 1.0, 'duration': 0.5}, step=5)
    sm.add_histogram('h', np.arange(10.0), step=5)
    att = {'decoder_attention': {'Decoder_LastBlock_CrossAttention':
                                 np.random.rand(1, 2, 8, 6)}}
    sm.display_attention_heads(att, step=5)
    sm.display_mel(np.random.rand(32, 20), step=5)
    sm.close()
    # main writer + one per component tag
    assert (tmp_path / 'mel').exists()
    assert (tmp_path / 'duration').exists()
    events = _load_raw_events(tmp_path)
    assert any(v.tag == 'Losses/total'
               for e in events for v in getattr(e.summary, 'value', []))
    # images written (raw records: Image submessage present, PNG magic)
    imgs = [v for e in events for v in getattr(e.summary, 'value', [])
            if v.HasField('image')]
    assert len(imgs) >= 2
    assert all(v.image.encoded_image_string[:8]
               == b'\x89PNG\r\n\x1a\n' for v in imgs)


def test_ignore_exception_never_raises(tmp_path):
    sm = SummaryManager(model=None, log_dir=tmp_path, config={})
    # bad input must not raise
    sm.display_mel('not-a-mel', step=0)
    sm.display_loss({}, step=0)


def test_control_frequency_throttles():
    from transformertts_tpu.utils.logging_utils import control_frequency

    class Sink:
        plot_frequency = 3
        calls = []

        @control_frequency('plot_frequency')
        def plot(self, step):
            self.calls.append(step)

    s = Sink()
    for step in range(7):
        s.plot(step=step)
    assert s.calls == [0, 3, 6]
