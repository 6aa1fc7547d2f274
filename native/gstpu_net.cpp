// gstpu native media-plane IO (SURVEY.md §2.9).
//
// The reference's threadshare runtime keeps the packet hot path in
// compiled code; here the equivalent is batched datagram IO via
// recvmmsg/sendmmsg so one Python->C call drains or fills a whole
// batch of UDP packets. Consumed through ctypes (gstpu/native_net.py)
// with a pure-Python fallback.

#include <cstdint>
#include <cstring>
#include <sys/socket.h>
#include <netinet/in.h>
#include <arpa/inet.h>
#include <errno.h>

extern "C" {

// Drain up to max_msgs datagrams from a non-blocking IPv4 UDP fd.
// buf: max_msgs * stride bytes; lengths[i] = datagram size;
// addrs[i]/ports[i] = sender (network order addr, host order port).
// Returns the number of datagrams read; 0 if the socket is empty;
// -1 on error (errno preserved).
int gstpu_net_recvmmsg(int fd, uint8_t* buf, int stride, int max_msgs,
                       int32_t* lengths, uint32_t* addrs,
                       uint16_t* ports) {
    if (max_msgs <= 0) return 0;
    static const int kMax = 256;
    if (max_msgs > kMax) max_msgs = kMax;
    struct mmsghdr msgs[kMax];
    struct iovec iovs[kMax];
    struct sockaddr_in srcs[kMax];
    memset(msgs, 0, sizeof(mmsghdr) * max_msgs);
    for (int i = 0; i < max_msgs; i++) {
        iovs[i].iov_base = buf + (size_t)i * stride;
        iovs[i].iov_len = stride;
        msgs[i].msg_hdr.msg_iov = &iovs[i];
        msgs[i].msg_hdr.msg_iovlen = 1;
        msgs[i].msg_hdr.msg_name = &srcs[i];
        msgs[i].msg_hdr.msg_namelen = sizeof(sockaddr_in);
    }
    int n = recvmmsg(fd, msgs, max_msgs, MSG_DONTWAIT, nullptr);
    if (n < 0) {
        if (errno == EAGAIN || errno == EWOULDBLOCK) return 0;
        return -1;
    }
    for (int i = 0; i < n; i++) {
        lengths[i] = (int32_t)msgs[i].msg_len;
        addrs[i] = srcs[i].sin_addr.s_addr;
        ports[i] = ntohs(srcs[i].sin_port);
    }
    return n;
}

// Send n datagrams from buf (stride-spaced) to addrs/ports.
// Returns the number actually sent (may be < n on EAGAIN).
int gstpu_net_sendmmsg(int fd, const uint8_t* buf, int stride,
                       const int32_t* lengths, const uint32_t* addrs,
                       const uint16_t* ports, int n) {
    static const int kMax = 256;
    if (n > kMax) n = kMax;
    struct mmsghdr msgs[kMax];
    struct iovec iovs[kMax];
    struct sockaddr_in dsts[kMax];
    memset(msgs, 0, sizeof(mmsghdr) * n);
    for (int i = 0; i < n; i++) {
        iovs[i].iov_base = const_cast<uint8_t*>(buf)
            + (size_t)i * stride;
        iovs[i].iov_len = lengths[i];
        memset(&dsts[i], 0, sizeof(sockaddr_in));
        dsts[i].sin_family = AF_INET;
        dsts[i].sin_addr.s_addr = addrs[i];
        dsts[i].sin_port = htons(ports[i]);
        msgs[i].msg_hdr.msg_iov = &iovs[i];
        msgs[i].msg_hdr.msg_iovlen = 1;
        msgs[i].msg_hdr.msg_name = &dsts[i];
        msgs[i].msg_hdr.msg_namelen = sizeof(sockaddr_in);
    }
    int sent = sendmmsg(fd, msgs, n, MSG_DONTWAIT);
    if (sent < 0) {
        if (errno == EAGAIN || errno == EWOULDBLOCK) return 0;
        return -1;
    }
    return sent;
}

}  // extern "C"
