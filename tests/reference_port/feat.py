"""TEST-ONLY ORACLE: mechanical Python-3 port of
/root/reference/processing/feat.py.

Port changes: `import base` -> package-relative import; nothing else — the
module body is already valid Python 3.
"""

import numpy as np

from tests.reference_port import base  # PY3: was `import base`


class FeatureComputer(object):
    """Strategy object computing one feature type (reference feat.py:7-69)."""

    def __init__(self, featureType, dynamic, conf):
        if featureType == 'fbank':
            self.comp_feat = base.logfbank
        elif featureType == 'mfcc':
            self.comp_feat = base.mfcc
        elif featureType == 'ssc':
            self.comp_feat = base.ssc
        else:
            raise Exception('unknown feature type')

        if dynamic == 'nodelta':
            self.comp_dyn = lambda x: x
        elif dynamic == 'delta':
            self.comp_dyn = base.delta
        elif dynamic == 'ddelta':
            self.comp_dyn = base.ddelta
        else:
            raise Exception('unknown dynamic type')

        self.conf = conf

    def __call__(self, sig, rate):
        if self.conf['snip_edges'] == 'True':
            # snip the edges
            sig = snip(sig, rate, float(self.conf['winlen']),
                       float(self.conf['winstep']))

        # compute the features and energy
        feat, energy = self.comp_feat(sig, rate, self.conf)

        # append the energy if requested
        if self.conf['include_energy'] == 'True':
            feat = np.append(feat, energy[:, np.newaxis], 1)

        # add the dynamic information
        feat = self.comp_dyn(feat)

        return feat


def snip(sig, rate, winlen, winstep):
    """Snip the utterance edges to fit the sliding window
    (reference feat.py:71-90)."""
    # calculate the number of frames in the utterance as number of samples in
    # the utterance / number of samples in the frame
    num_frames = int((len(sig)-winlen*rate)/(winstep*rate))
    # cut of the edges to fit the number of frames
    sig = sig[0:int(num_frames*winstep*rate + winlen*rate)]

    return sig
