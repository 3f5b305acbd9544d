"""YAML training configuration manager.

Capability parity with the reference (utils/training_config_manager.py:13-160):
six config sections merged into one flat dict, session-named artifact
directories (changing ``audio_settings_name`` etc. re-keys the data dirs),
git-hash stamping + mismatch warnings, model construction from config,
config dumping next to weights, interactive directory reset, and
restore-latest-checkpoint with reduction-schedule re-application.

Differences by design:
- the optimizer is an optax transformation with the LR schedule evaluated on
  device (training/state.py) — no per-step host assign;
- checkpoints are TrainState ``.npz`` files (training/checkpointing.py), not
  tf.train.Checkpoint dirs.
"""
import shutil
import subprocess
from pathlib import Path

import numpy as np
import yaml

from transformertts_tpu.utils.scheduling import reduction_schedule

CONFIG_SECTIONS = ['paths', 'naming', 'training_data_settings',
                   'audio_settings', 'text_settings']


class TrainingConfigManager:

    def __init__(self, config_path: str, aligner: bool = False):
        self.config_path = Path(config_path)
        self.model_kind = 'aligner' if aligner else 'tts'
        self.config = self._load_config()
        self.git_hash = self._get_git_hash()
        self.data_name = self.config['data_name']

        text_name = self.config['text_settings_name']
        audio_name = self.config['audio_settings_name']
        aligner_name = self.config['aligner_settings_name']
        tts_name = self.config['tts_settings_name']
        self.session_names = {
            'data': f'{text_name}.{audio_name}',
            'aligner': f'{aligner_name}.{text_name}.{audio_name}',
            'tts': f'{tts_name}.{aligner_name}',
        }

        self.wav_directory = Path(self.config['wav_directory'])
        self.metadata_path = Path(self.config['metadata_path'])
        self.data_dir = Path(f"{self.config['train_data_directory']}.{self.data_name}")
        self.base_dir = (Path(self.config['log_directory']) / self.data_name
                         / self.session_names[self.model_kind])
        self.log_dir = self.base_dir / 'logs'
        self.weights_dir = self.base_dir / 'weights'
        self.train_metadata_path = self.data_dir / f'train_metadata.{text_name}.txt'
        self.valid_metadata_path = self.data_dir / f'valid_metadata.{text_name}.txt'
        self.phonemized_metadata_path = self.data_dir / f'phonemized_metadata.{text_name}.txt'
        self.mel_dir = self.data_dir / f'mels.{audio_name}'
        self.pitch_dir = self.data_dir / f'pitch.{audio_name}'
        self.duration_dir = self.data_dir / f"durations.{self.session_names['aligner']}"
        self.pitch_per_char = self.data_dir / f"char_pitch.{self.session_names['aligner']}"

        self.learning_rate = float(np.asarray(
            self.config['learning_rate_schedule'], np.float32)[0, 1])
        if self.model_kind == 'aligner':
            self.max_r = int(np.asarray(
                self.config['reduction_factor_schedule'])[0, 1])
            self.stop_scaling = float(self.config.get('stop_loss_scaling', 1.0))

    # ----------------------------------------------------------------- config

    def _load_config(self) -> dict:
        with open(self.config_path) as f:
            session_config = yaml.safe_load(f)
        merged = {}
        for section in CONFIG_SECTIONS + [f'{self.model_kind}_settings']:
            merged.update(session_config[section])
        return merged

    @staticmethod
    def _get_git_hash():
        try:
            return subprocess.check_output(
                ['git', 'describe', '--always'],
                stderr=subprocess.DEVNULL).strip().decode()
        except Exception:
            return None

    def _check_hash(self):
        stored = self.config.get('git_hash')
        if stored is not None and self.git_hash is not None \
                and stored != self.git_hash:
            print(f'WARNING: git hash mismatch: current {self.git_hash}, '
                  f'config {stored}')

    def print_config(self):
        print(f'\nCONFIGURATION {self.session_names[self.model_kind]}')
        for k, v in self.config.items():
            print(f'  - {k} : {v}')

    def update_config(self):
        self.config['git_hash'] = self.git_hash
        self.config['automatic'] = True

    def dump_config(self):
        self.update_config()
        self.base_dir.mkdir(parents=True, exist_ok=True)
        with open(self.base_dir / 'config.yaml', 'w') as f:
            yaml.safe_dump(dict(self.config), f, allow_unicode=True)

    # ----------------------------------------------------------------- model

    def get_model(self, ignore_hash: bool = False):
        if not ignore_hash:
            self._check_hash()
        if self.model_kind == 'aligner':
            from transformertts_tpu.models.aligner import Aligner
            return Aligner.from_config(self.config, max_r=self.max_r)
        from transformertts_tpu.models.forward_tts import ForwardTransformer
        return ForwardTransformer.from_config(self.config)

    def get_optimizer(self, global_clip_norm: float = None):
        from transformertts_tpu.training.state import make_optimizer
        return make_optimizer(self.config['learning_rate_schedule'],
                              global_clip_norm=global_clip_norm)

    def get_mesh(self):
        """Device mesh from the ``mesh: {data, model}`` config block.

        This is the user-facing path to multi-device training: set
        ``mesh: {data: 4, model: 2}`` (or data: -1 for "all remaining
        devices") in aligner_settings/tts_settings and every train CLI runs
        SPMD over it. ``multihost: true`` additionally brings up
        jax.distributed before the mesh is built.
        """
        from transformertts_tpu.parallel import (MeshConfig, make_mesh,
                                                 maybe_initialize_distributed)
        maybe_initialize_distributed(self.config)
        spec = self.config.get('mesh') or {}
        return make_mesh(MeshConfig(data=int(spec.get('data', -1)),
                                    model=int(spec.get('model', 1))))

    def get_trainer(self, model, mesh=None):
        tx = self.get_optimizer()
        if mesh is None:
            mesh = self.get_mesh()
        if self.model_kind == 'aligner':
            from transformertts_tpu.training.aligner_trainer import AlignerTrainer
            return AlignerTrainer(
                model, tx, mesh=mesh, stop_scaling=self.stop_scaling,
                grad_accumulation=int(self.config.get('grad_accumulation', 1)),
                narrow_pv=bool(self.config.get('narrow_pv', True)))
        from transformertts_tpu.training.forward_trainer import ForwardTrainer
        return ForwardTrainer(
            model, tx, mesh=mesh,
            grad_accumulation=int(self.config.get('grad_accumulation', 1)))

    # ------------------------------------------------------------------ dirs

    def create_remove_dirs(self, clear_dir: bool = False,
                           clear_logs: bool = False,
                           clear_weights: bool = False,
                           assume_yes: bool = False):
        self.base_dir.mkdir(parents=True, exist_ok=True)
        self.data_dir.mkdir(parents=True, exist_ok=True)
        for d in [self.pitch_dir, self.pitch_per_char, self.mel_dir,
                  self.duration_dir]:
            d.mkdir(exist_ok=True)

        def confirm(prompt):
            return assume_yes or input(prompt) == 'y'

        if clear_dir and confirm(
                f'Delete {self.log_dir} AND {self.weights_dir}? (y/[n])'):
            shutil.rmtree(self.log_dir, ignore_errors=True)
            shutil.rmtree(self.weights_dir, ignore_errors=True)
        if clear_logs and confirm(f'Delete {self.log_dir}? (y/[n])'):
            shutil.rmtree(self.log_dir, ignore_errors=True)
        if clear_weights and confirm(f'Delete {self.weights_dir}? (y/[n])'):
            shutil.rmtree(self.weights_dir, ignore_errors=True)
        self.log_dir.mkdir(exist_ok=True)
        self.weights_dir.mkdir(exist_ok=True)

    # ------------------------------------------------------------ restoration

    def load_model(self, checkpoint_path: str = None, verbose: bool = True):
        """Model with weights from a checkpoint (latest if unspecified);
        re-applies the reduction schedule for aligners."""
        import jax
        from transformertts_tpu.training import checkpointing
        model = self.get_model()
        model.init_params(jax.random.PRNGKey(42))
        tx = self.get_optimizer()
        from transformertts_tpu.training.state import init_state
        template = init_state(model.params, tx)
        if checkpoint_path is not None:
            state = checkpointing.restore_checkpoint(checkpoint_path, template)
        else:
            state = checkpointing.restore_latest(self.weights_dir, template)
        if state is None:
            print(f'WARNING: no checkpoint under {self.weights_dir}; '
                  f'using fresh weights.')
        else:
            model.params = state.params
            model.step = int(state.step)
            if verbose:
                print(f'restored weights at step {model.step}')
        if self.model_kind == 'aligner':
            r = reduction_schedule(model.step,
                                   self.config['reduction_factor_schedule'])
            model.set_constants(reduction_factor=r)
        return model
