"""Shared text-file and audio-file libraries under the output root.

Framework-native re-derivation of the reference's small file-library
routes:

- text-file browser over ``VRGDG_TEMP/TextFiles``
  (``/root/reference/VRGDG_GeneralNodes.py:1606-1830``): category
  listing, manual folder listing with newest-first merge across root
  candidates, folder enumeration, and the custom-base-path
  normalization that accepts any ancestor of the TextFiles layout,
- the builder's editable text-file load/save
  (``VRGDG_MusicVideoBuilderNodes.py:2666-2694``): ``.txt``/``.json``
  only,
- the audio library list/upload
  (``VRGDG_AudioNodes.py:497-560``): the reference stores uploads in
  ComfyUI's input dir; standalone they live under
  ``<output_root>/VRGDG_AudioFiles`` — the same folder
  :func:`vrgdg_tpu.api.builder.default_audio_srt_paths` reads,
- ``part2/load_concept_prompts``
  (``VRGDG_GeneralNodes2.py:1220-1250``): the shared ConceptPrompts
  handoff file.
"""

from __future__ import annotations

import os
import re

from .builder import _clean, safe_component
from .paths import DEFAULT_OUTPUT_ROOT

TEXT_ROOT_FOLDER = "VRGDG_TEMP"
TEXT_SUBFOLDER = "TextFiles"
CATEGORY_OPTIONS = ("subject1", "subject2", "scene1", "scene2",
                    "other1", "other2")
# the reference library accepts audio AND video containers
# (filter_files_content_types([..., "audio", "video"])); the builder's
# default-audio discovery reads only the pure-audio subset
# (builder.AUDIO_EXTENSIONS)
AUDIO_EXTENSIONS = (".wav", ".mp3", ".flac", ".m4a", ".ogg", ".mp4",
                    ".mov", ".webm")


def normalize_category(category) -> str:
    value = str(category or "").strip().lower()
    return value if value in CATEGORY_OPTIONS else CATEGORY_OPTIONS[0]


def sanitize_segment(value, fallback: str = "default") -> str:
    text = re.sub(r"[^A-Za-z0-9_\- ]+", "_",
                  str(value or "").strip()).strip(" .")
    return text or fallback


def text_files_root(output_root=None) -> str:
    return os.path.normpath(os.path.join(
        os.path.abspath(output_root or DEFAULT_OUTPUT_ROOT),
        TEXT_ROOT_FOLDER, TEXT_SUBFOLDER))


def normalize_custom_root(custom_base_path) -> str:
    """Accept any level of the ``VRGDG_TEMP/TextFiles`` layout — the
    base dir, either layout component, or a folder inside it — and
    return the TextFiles root (``:1704-1721``)."""
    raw = str(custom_base_path or "").strip().strip("\"'")
    if not raw:
        return ""
    path = os.path.normpath(os.path.abspath(
        os.path.expandvars(os.path.expanduser(raw))))
    layout = [TEXT_ROOT_FOLDER.lower(), TEXT_SUBFOLDER.lower()]
    parts = path.split(os.sep)
    tail = [part.lower() for part in parts[-3:]]
    # locate where the given path sits relative to the two-component
    # layout and re-anchor onto its TextFiles directory
    if tail[-2:] == layout:
        return path
    if tail[-1:] == layout[:1]:
        return os.path.normpath(os.path.join(path, TEXT_SUBFOLDER))
    if tail[:2] == layout:
        return os.path.normpath(os.sep.join(parts[:-1]))
    return os.path.normpath(os.path.join(path, TEXT_ROOT_FOLDER,
                                         TEXT_SUBFOLDER))


def list_category(category, output_root=None) -> dict:
    """``.txt`` names in a category folder (``:1730-1753``)."""
    category = normalize_category(category)
    folder = os.path.join(text_files_root(output_root), category)
    files = []
    if os.path.isdir(folder):
        files = sorted((name for name in os.listdir(folder)
                        if name.lower().endswith(".txt")
                        and os.path.isfile(os.path.join(folder, name))),
                       key=str.lower)
    return {"category": category, "files": files, "folder": folder}


def list_folders(output_root=None) -> dict:
    root = text_files_root(output_root)
    folders = []
    if os.path.isdir(root):
        folders = sorted((name for name in os.listdir(root)
                          if os.path.isdir(os.path.join(root, name))),
                         key=str.lower)
    return {"folders": folders, "root": root}


def list_folder_files(folder_name, use_most_recent: bool = False,
                      custom_base_path: str = "",
                      output_root=None) -> dict:
    """Newest-first ``.txt`` listing for a named folder (``:1768-1808``);
    ``use_most_recent`` keeps only the newest file."""
    safe_folder = sanitize_segment(folder_name)
    root = (normalize_custom_root(custom_base_path)
            if custom_base_path else text_files_root(output_root))
    folder_path = os.path.normpath(os.path.join(root, safe_folder))
    rows = []
    if os.path.isdir(folder_path):
        for name in os.listdir(folder_path):
            full = os.path.join(folder_path, name)
            if not os.path.isfile(full) \
                    or not name.lower().endswith(".txt"):
                continue
            try:
                rows.append((name, os.path.getmtime(full)))
            except OSError:
                rows.append((name, 0.0))
    rows.sort(key=lambda row: (-row[1], row[0].lower()))
    files = [name for name, _mtime in rows]
    if use_most_recent and files:
        files = files[:1]
    return {"folder": safe_folder, "folder_path": folder_path,
            "use_most_recent": bool(use_most_recent),
            "custom_text_files_root":
                normalize_custom_root(custom_base_path)
                if custom_base_path else "",
            "files": files}


# ------------------------------------------------------------------
# editable text files (builder load_text_file / save_text_file)
# ------------------------------------------------------------------

_EDITABLE_SUFFIXES = frozenset({".txt", ".json"})


def _editable_text_file(payload, content=None) -> dict:
    """Shared read/write body for the builder's editable-file routes;
    only ``.txt``/``.json`` may pass, and writes create parents."""
    file_path = os.path.normpath(os.path.abspath(
        _clean(payload.get("path"))))
    if not _clean(payload.get("path")):
        raise ValueError("Text file path is empty.")
    if os.path.splitext(file_path)[1].lower() not in _EDITABLE_SUFFIXES:
        raise ValueError("Only .txt or .json files can be edited here.")
    if content is None:
        if not os.path.isfile(file_path):
            raise FileNotFoundError(
                f"Text file was not found: {file_path}")
        with open(file_path, "r", encoding="utf-8-sig",
                  errors="replace") as handle:
            return {"path": file_path, "content": handle.read()}
    os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
    with open(file_path, "w", encoding="utf-8", newline="") as handle:
        handle.write(content)
    return {"path": file_path}


def load_text_file(payload: dict) -> dict:
    return _editable_text_file(payload)


def save_text_file(payload: dict) -> dict:
    return _editable_text_file(
        payload, str(payload.get("content", "") or ""))


# ------------------------------------------------------------------
# audio library
# ------------------------------------------------------------------

def audio_library_folder(output_root=None) -> str:
    folder = os.path.join(os.path.abspath(output_root
                                          or DEFAULT_OUTPUT_ROOT),
                          "VRGDG_AudioFiles")
    os.makedirs(folder, exist_ok=True)
    return folder


def list_audio(output_root=None) -> dict:
    folder = audio_library_folder(output_root)
    files = sorted(name for name in os.listdir(folder)
                   if os.path.isfile(os.path.join(folder, name))
                   and name.lower().endswith(AUDIO_EXTENSIONS))
    return {"files": files, "input_dir": folder}


def save_audio_upload(filename, data: bytes, overwrite: bool = False,
                      output_root=None) -> dict:
    """Store an uploaded audio file, suffixing ``(N)`` unless
    overwriting (``VRGDG_AudioNodes.py:519-560``)."""
    folder = audio_library_folder(output_root)
    name = os.path.basename(_clean(filename))
    stem, ext = os.path.splitext(name)
    stem = safe_component(stem, "audio_upload")
    if ext.lower() not in AUDIO_EXTENSIONS:
        raise ValueError("Unsupported audio type.")
    candidate = os.path.join(folder, f"{stem}{ext}")
    if not overwrite:
        index = 1
        while os.path.exists(candidate):
            candidate = os.path.join(folder, f"{stem} ({index}){ext}")
            index += 1
    with open(candidate, "wb") as handle:
        handle.write(data)
    # response contract: {"name", "files"} (VRGDG_AudioNodes.py:546-548)
    return {"name": os.path.basename(candidate),
            "files": list_audio(output_root)["files"],
            "path": candidate, "input_dir": folder}


def load_shared_concept_prompts(output_root=None) -> dict:
    """The Step-1 -> Step-2 ConceptPrompts handoff file
    (``VRGDG_GeneralNodes2.py:1220-1250``)."""
    path = os.path.join(text_files_root(output_root), "ConceptPrompts",
                        "ConceptPrompts.txt")
    if not os.path.isfile(path):
        raise FileNotFoundError(
            "ConceptPrompts.txt was not found. Run Step 1 first or "
            "paste the prompt JSON manually.")
    with open(path, "r", encoding="utf-8-sig") as handle:
        # response contract: {"text", "path"} (GeneralVideoNodes2:1246)
        return {"path": path, "text": handle.read()}
